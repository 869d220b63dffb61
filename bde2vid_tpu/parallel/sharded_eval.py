"""Data-parallel evaluation over a device mesh.

The reference's only multi-worker story is manual process splitting by
checkpoint range (eval_models_seq.py:110-121, 354-357). Here parallel eval
is first-class and exact: the eval protocol resets recurrent state at every
subseq_L chunk (reference bde2vid.py:31 + eval_models_seq.py:216-219), so
chunks are independent — the natural data-parallel unit. Chunks shard over
the mesh's 'data' axis; each device scans its chunks locally; results
all-gather once at the end (XLA inserts the collective).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bde2vid_tpu.models.api import ModelSpec, run_sequence


# one traced+jitted sharded forward per (architecture, shapes, chunk, mesh);
# params are a jit ARGUMENT so checkpoint sweeps over the same architecture
# reuse the trace (mirrors the sequential driver's _RUN_FN_CACHE)
_SHARDED_FN_CACHE = {}


def _cached_sharded_fn(spec: ModelSpec, shapes, chunk: int, mesh: Mesh):
    arch_key = (
        spec.name,
        spec.module.__class__.__name__,
        str(getattr(spec.module, "config", "")),
        str(getattr(spec.module, "dtype", "")),
    )
    key = (arch_key, shapes, chunk, tuple(mesh.devices.ravel()), spec.is_sequence_model)
    if key in _SHARDED_FN_CACHE:
        return _SHARDED_FN_CACHE[key]

    module = spec.module
    if spec.is_sequence_model:

        def per_chunk(params, v):
            return module.apply(params, v)[0]["image"]

    else:
        state0 = module.initial_state(1, shapes[1], shapes[2])  # (1, H, W, C)

        def per_chunk(params, v):
            return run_sequence(module, params, v, state0)[0]

    # shard_map, not global-SPMD jit annotations: each device runs the
    # forward LOCALLY on its own chunks. This is safe by construction for
    # the fused Pallas attention kernel — a Mosaic custom call inside a
    # globally-sharded jit depends on the SPMD partitioner's custom-call
    # handling (unverifiable on this one-chip setup and liable to force a
    # replicating all-gather); inside shard_map the kernel only ever sees
    # device-local shapes. Chunks are embarrassingly parallel, so
    # out_specs=P('data') is the only collective (the final gather).
    from bde2vid_tpu.parallel.mesh import get_shard_map

    shard_map, rep_kw = get_shard_map()

    def local(params, local_chunks):
        return jax.vmap(lambda v: per_chunk(params, v))(local_chunks)

    run_all = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(), jax.sharding.PartitionSpec("data")),
            out_specs=jax.sharding.PartitionSpec("data"),
            **rep_kw,
        )
    )

    _SHARDED_FN_CACHE[key] = run_all
    return run_all


def eval_chunks_sharded(
    spec: ModelSpec,
    voxels: jax.Array,  # (T, 1, H, W, C) padded voxel sequence
    chunk: int,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Run the per-chunk forward with chunks sharded across devices.

    Semantics identical to the sequential driver: state resets per chunk.
    For forward-only step models T pads up to whole chunks (end padding
    cannot affect earlier outputs); for BIDIRECTIONAL sequence models a
    ragged tail must NOT be zero-padded (the backward sweep and temporal
    attention would see the synthetic frames — same constraint as the
    sequential driver, eval/driver.py), so the tail runs as its own
    unsharded forward and only the full chunks shard.
    Returns (T, 1, H', W', 1) predictions.
    """
    if mesh is None:
        devices = np.asarray(jax.devices())
        mesh = Mesh(devices.reshape(-1, 1), axis_names=("data", "spatial"))
    n_dev = mesh.shape["data"]
    t = voxels.shape[0]

    tail_preds = None
    if spec.is_sequence_model and t % chunk != 0:
        # jitted tail (the sequential driver's cached fn — an unjitted
        # module.apply would run op-by-op at ~1-2 ms tunnel latency per op)
        from bde2vid_tpu.eval.driver import _cached_run_fn

        t_full = (t // chunk) * chunk
        tail = voxels[t_full:]
        run_tail = _cached_run_fn(spec, (voxels.shape[2], voxels.shape[3]), True)
        tail_preds = run_tail(tail)
        if t_full == 0:
            return tail_preds
        voxels = voxels[:t_full]
        t = t_full

    n_chunks = -(-t // chunk)
    n_chunks = -(-n_chunks // n_dev) * n_dev  # multiple of n_dev
    t_pad = n_chunks * chunk
    if t_pad != t:
        pad = jnp.zeros((t_pad - t, *voxels.shape[1:]), voxels.dtype)
        voxels = jnp.concatenate([voxels, pad], axis=0)

    # (n_chunks, chunk, 1, H, W, C), chunks sharded over 'data'
    chunks = voxels.reshape(n_chunks, chunk, *voxels.shape[1:])
    sh = NamedSharding(mesh, P("data"))
    chunks = jax.device_put(chunks, sh)

    run_all = _cached_sharded_fn(spec, tuple(voxels.shape[1:]), chunk, mesh)
    with mesh:
        preds = run_all(spec.params, chunks)
    preds = preds.reshape(t_pad, *preds.shape[2:])[:t]
    if tail_preds is not None:
        preds = jnp.concatenate([preds, tail_preds], axis=0)
    return preds
