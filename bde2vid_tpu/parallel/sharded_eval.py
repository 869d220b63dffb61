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


def eval_chunks_sharded(
    spec: ModelSpec,
    voxels: jax.Array,  # (T, 1, H, W, C) padded voxel sequence
    chunk: int,
    mesh: Optional[Mesh] = None,
) -> jax.Array:
    """Run the per-chunk forward with chunks sharded across devices.

    Semantics identical to the sequential driver: state resets per chunk.
    T is padded up to a whole number of chunks per device; padding steps are
    dropped from the output. Returns (T, 1, H', W', 1) predictions.
    """
    if mesh is None:
        devices = np.asarray(jax.devices())
        mesh = Mesh(devices.reshape(-1, 1), axis_names=("data", "spatial"))
    n_dev = mesh.shape["data"]
    t = voxels.shape[0]

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

    if spec.is_sequence_model:

        def per_chunk(v):
            return spec.module.apply(spec.params, v)[0]["image"]

    else:
        state0 = spec.module.initial_state(1, voxels.shape[2], voxels.shape[3])

        def per_chunk(v):
            return run_sequence(spec.module, spec.params, v, state0)[0]

    @jax.jit
    def run_all(chunks):
        out = jax.vmap(per_chunk)(chunks)
        return jax.lax.with_sharding_constraint(out, sh)

    with mesh:
        preds = run_all(chunks)
    preds = preds.reshape(t_pad, *preds.shape[2:])
    return preds[:t]
