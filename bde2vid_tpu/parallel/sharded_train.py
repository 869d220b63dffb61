"""Data-parallel TRAINING over a device mesh via shard_map.

The reference has no distributed training (SURVEY §2.5/§5.8 — no
torch.distributed/DDP anywhere); this is the build's own multi-chip
training path. Design mirrors parallel/sharded_eval.py: shard_map, not
global-SPMD jit annotations, so each device runs the forward+backward
LOCALLY on its batch shard. That composes with the fused Pallas window
attention by construction — the Mosaic custom call (and its custom-vjp
backward) only ever sees device-local shapes, instead of depending on the
SPMD partitioner's custom-call handling. The only collectives are the
gradient/loss pmeans over the 'data' axis (XLA rides them over ICI).

Exactness: with equal batch shards, a pmean of per-shard mean-losses (and
of their gradients) equals the unsharded full-batch mean — proven against
the single-device step in tests/test_sharded_train.py, Pallas kernel
included.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bde2vid_tpu.parallel.mesh import get_shard_map
from bde2vid_tpu.train.trainer import SequenceLossComputer, make_loss_fn

shard_map, _REP_KW = get_shard_map()


def make_dp_train_step(
    model,
    tx,
    loss_computer: SequenceLossComputer,
    mesh: Mesh,
    lpips_params=None,
    is_sequence_model: bool = True,
    donate: bool = True,
    remat: bool = False,
):
    """Build a jitted DATA-PARALLEL train step over ``mesh``'s 'data' axis.

    step(params, opt_state, rng, voxels (T,N,H,W,C), frames (T,N,H,W,1),
        flows or None) -> (params, opt_state, loss_dict)

    Same signature and semantics as train.trainer.make_train_step; the
    batch axis N (axis 1) must be divisible by mesh.shape['data'] (equal
    shards per device). Params/opt_state
    replicate; batch tensors shard over 'data'. Mutated batch_stats (BN/IN
    training) pmean over shards — each shard's running-stat update is an
    equal-weight estimate of the same batch statistics.
    """
    import optax

    loss_fn = make_loss_fn(
        model,
        loss_computer,
        lpips_params=lpips_params,
        is_sequence_model=is_sequence_model,
        remat=remat,
    )

    def local_step(params, opt_state, rng, voxels, frames, flows):
        # fold the shard index into the droppath key: the key replicates
        # over the mesh, and without the fold every shard would draw the
        # SAME stochastic-depth masks for its (N, 1, 1, 1) bernoulli —
        # all samples dropping the same blocks every step, unlike the
        # unsharded step's independent per-sample draws
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        rngs = {"droppath": rng}
        (_, (loss_dict, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, voxels, frames, flows, rngs
        )
        grads = jax.lax.pmean(grads, "data")
        loss_dict = jax.lax.pmean(loss_dict, "data")
        updates, opt_state = tx.update(grads, opt_state, params)
        new_vars = dict(optax.apply_updates(params, updates))
        if mut:
            new_vars.update(jax.lax.pmean(mut, "data"))
        return new_vars, opt_state, loss_dict

    batch_spec = P(None, "data")  # (T, N, ...) tensors shard on N
    step_sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), batch_spec, batch_spec, batch_spec),
        out_specs=(P(), P(), P()),
        **_REP_KW,
    )
    donate_argnums = (0, 1) if donate else ()
    jitted = jax.jit(step_sharded, donate_argnums=donate_argnums)

    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, batch_spec)

    def step(params, opt_state, rng, voxels, frames, flows):
        # place inputs if the caller has not: replicated trees, sharded batch
        voxels = jax.device_put(voxels, data_sh)
        frames = jax.device_put(frames, data_sh)
        if flows is not None:
            flows = jax.device_put(flows, data_sh)
        rng = jax.device_put(rng, rep)
        with mesh:
            return jitted(params, opt_state, rng, voxels, frames, flows)

    return step
