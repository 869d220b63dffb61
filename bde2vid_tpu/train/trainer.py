"""Sequence-loss computation + train step factory + checkpoint IO.

Loss semantics follow the reference BDE2VID in-loop computation
(bde2vid_cross_scale_propogation_V5.py:210-241):
- losses evaluated per step, optionally subsampled by ``loss_inds``
  (an int n means steps {0, n, 2n, ...} within the first 40 — reference
  :40-43);
- PerceptualLoss/L1Loss take (pred, gt); VIPLoss also takes the previous
  step's (gt, pred) features (cached state, reset per sequence);
- TemporalConsistencyLoss takes (prev_gt, cur_gt, prev_pred, cur_pred,
  flow) and only applies for t > L0;
- total = mean over evaluated steps per loss, summed over losses.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bde2vid_tpu.losses import build_loss

Array = jax.Array


class SequenceLossComputer:
    """Builds losses from a config list and evaluates them over an image
    sequence, functionally (explicit VIP feature state)."""

    def __init__(
        self,
        losses_cfg: Sequence[Dict],
        loss_inds: Optional[Any] = None,
        unroll_threshold: int = 64,
    ):
        self.losses = {cfg["type"]: build_loss(cfg) for cfg in losses_cfg}
        if loss_inds is not None and not isinstance(loss_inds, (list, tuple)):
            loss_inds = [t for t in range(40) if t % int(loss_inds) == 0]
        self.loss_inds = loss_inds
        # more evaluated steps than this switches from the python unroll
        # (cheap graph, skips ungated steps entirely — right for the
        # reference's T<=40 loss_inds regime) to a lax.scan (O(1) graph size
        # for arbitrary T; guards against a T=1000 config tracing for minutes)
        self.unroll_threshold = int(unroll_threshold)

    def _gate(self, T: int) -> np.ndarray:
        if self.loss_inds is None:
            return np.ones(T, bool)
        g = np.zeros(T, bool)
        for t in self.loss_inds:
            if t < T:
                g[t] = True
        return g

    def __call__(
        self,
        lpips_params,
        preds: Array,  # (T, N, H, W, 1)
        gts: Array,  # (T, N, H, W, 1)
        flows: Optional[Array] = None,  # (T, N, H, W, 2)
    ) -> Tuple[Array, Dict[str, Array]]:
        T = preds.shape[0]
        gate = self._gate(T)
        if "TemporalConsistencyLoss" in self.losses and flows is None:
            # same clear error the scan path raises — without it the
            # unrolled path dies on flows[t] with a bare TypeError
            raise ValueError("TemporalConsistencyLoss requires flows")
        if int(gate.sum()) > self.unroll_threshold:
            return self._call_scan(lpips_params, preds, gts, flows, gate)
        sums: Dict[str, Array] = {}
        counts: Dict[str, Array] = {}
        vip_state = None
        for name in self.losses:
            sums[name] = jnp.zeros(())
            counts[name] = jnp.zeros(())

        prev_gt = prev_pd = None
        for t in range(T):  # static unroll: loss graph is cheap vs model fwd
            cur_pd, cur_gt = preds[t], gts[t]
            if gate[t]:
                for name, fn in self.losses.items():
                    if name in ("PerceptualLoss", "L1Loss"):
                        v, _ = fn(lpips_params, cur_pd, cur_gt)
                    elif name == "VIPLoss":
                        v, vip_state = fn(lpips_params, cur_pd, cur_gt, vip_state)
                    elif name == "TemporalConsistencyLoss":
                        if t <= fn.L0 or prev_gt is None:
                            continue
                        v, _ = fn(
                            lpips_params, prev_gt, cur_gt, prev_pd, cur_pd, flows[t]
                        )
                    else:
                        raise ValueError(f"unknown loss {name}")
                    sums[name] = sums[name] + v
                    counts[name] = counts[name] + 1.0
            prev_gt, prev_pd = cur_gt, cur_pd

        loss_dict = {}
        total = jnp.zeros(())
        for name in self.losses:
            mean = sums[name] / jnp.maximum(counts[name], 1.0)
            short = "L_" + "".join(c for c in name if c.isupper())
            loss_dict[short] = mean
            total = total + mean
        loss_dict["loss"] = total
        return total, loss_dict

    def _call_scan(
        self,
        lpips_params,
        preds: Array,
        gts: Array,
        flows: Optional[Array],
        gate,
    ) -> Tuple[Array, Dict[str, Array]]:
        """lax.scan form of __call__: identical semantics, O(1) trace size.

        VIP state threads through the carry (updated only at gated steps,
        temporal term suppressed until the first gated step — matching the
        state=None behavior of the unrolled loop); TemporalConsistency gets
        its own gate (t > L0, t >= 1)."""
        T = preds.shape[0]
        names = list(self.losses)
        gate_f = jnp.asarray(gate, jnp.float32)
        prev_preds = jnp.concatenate([preds[:1], preds[:-1]])
        prev_gts = jnp.concatenate([gts[:1], gts[:-1]])

        tc = self.losses.get("TemporalConsistencyLoss")
        if tc is not None:
            if flows is None:
                raise ValueError("TemporalConsistencyLoss requires flows")
            t_idx = np.arange(T)
            gate_tc = gate_f * jnp.asarray(
                (t_idx > tc.L0) & (t_idx >= 1), jnp.float32
            )
        else:
            gate_tc = gate_f
            flows = jnp.zeros((T, 1, 1, 1, 2), preds.dtype)

        vip = self.losses.get("VIPLoss")
        if vip is not None:
            ph = jax.eval_shape(
                lambda p, a, b: vip(p, a, b, None)[1], lpips_params, preds[0], gts[0]
            )
            vip_state0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), ph
            )
        else:
            vip_state0 = ()

        def body(carry, x):
            vip_state, vip_seen, sums, counts = carry
            pd, gt, ppd, pgt, fl, g, g_tc = x
            new_sums, new_counts = [], []
            for j, name in enumerate(names):
                fn = self.losses[name]
                if name in ("PerceptualLoss", "L1Loss"):
                    v, _ = fn(lpips_params, pd, gt)
                    gj = g
                elif name == "VIPLoss":
                    v, new_state = fn.step(lpips_params, pd, gt, vip_state, vip_seen)
                    vip_state = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(g > 0, n, o), new_state, vip_state
                    )
                    vip_seen = jnp.logical_or(vip_seen, g > 0)
                    gj = g
                elif name == "TemporalConsistencyLoss":
                    v, _ = fn(lpips_params, pgt, gt, ppd, pd, fl)
                    gj = g_tc
                else:
                    raise ValueError(f"unknown loss {name}")
                new_sums.append(sums[j] + gj * v)
                new_counts.append(counts[j] + gj)
            return (vip_state, vip_seen, jnp.stack(new_sums), jnp.stack(new_counts)), None

        carry0 = (
            vip_state0,
            jnp.asarray(False),
            jnp.zeros((len(names),)),
            jnp.zeros((len(names),)),
        )
        (_, _, sums, counts), _ = jax.lax.scan(
            body, carry0, (preds, gts, prev_preds, prev_gts, flows, gate_f, gate_tc)
        )

        loss_dict = {}
        total = jnp.zeros(())
        for j, name in enumerate(names):
            mean = sums[j] / jnp.maximum(counts[j], 1.0)
            short = "L_" + "".join(c for c in name if c.isupper())
            loss_dict[short] = mean
            total = total + mean
        loss_dict["loss"] = total
        return total, loss_dict


def make_loss_fn(
    model,
    loss_computer: SequenceLossComputer,
    lpips_params=None,
    is_sequence_model: bool = True,
    remat: bool = False,
):
    """loss_fn(variables, voxels, frames, flows, rngs) ->
    (total, (loss_dict, mutated_stats)) — the shared core of the
    single-device train step and the shard_map data-parallel step."""
    from bde2vid_tpu.models.api import run_sequence

    def forward(variables, voxels, rngs):
        # BN/IN-bearing models (train=True) mutate "batch_stats": declare
        # it mutable and thread the updates out of the step — without this
        # flax raises ModifyScopeVariableError on the first step, and a
        # mutable-and-discard would silently never train the running
        # averages (r3 review, verified). Returns (preds, mutated_stats)
        # where mutated_stats is {} for stat-free models.
        if is_sequence_model:
            # BN/IN-normed sequence models train too: in train mode BDE2VID's
            # nn.scan sweeps CARRY batch_stats (models/bde2vid.py scan_stats)
            # so the running-stat momentum updates compound across time steps
            # like a torch per-step loop, and the final stats surface here
            # through the mutable apply.
            (out, _), mut = model.apply(
                variables, voxels, rngs=rngs, mutable=["batch_stats"]
            )
            return out["image"], mut

        n, h, w = voxels.shape[1], voxels.shape[2], voxels.shape[3]
        state0 = model.initial_state(n, h, w)
        has_stats = "batch_stats" in variables
        if not has_stats:
            imgs, _ = run_sequence(model, variables, voxels, state0)
            return imgs, {}

        base = {k: v for k, v in variables.items() if k != "batch_stats"}

        def step_fn(carry, voxel):
            state, bstats = carry
            (out, new_state), mut = model.apply(
                {**base, "batch_stats": bstats},
                voxel,
                state,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            return (new_state, mut["batch_stats"]), out["image"]

        (_, final_stats), imgs = jax.lax.scan(
            step_fn, (state0, variables["batch_stats"]), voxels
        )
        return imgs, {"batch_stats": final_stats}

    fwd = jax.checkpoint(forward, static_argnums=()) if remat else forward

    def loss_fn(params, voxels, frames, flows, rngs):
        preds, mut = fwd(params, voxels, rngs)
        total, loss_dict = loss_computer(lpips_params, preds, frames, flows)
        return total, (loss_dict, mut)

    return loss_fn


def make_train_step(
    model,
    tx,
    loss_computer: SequenceLossComputer,
    lpips_params=None,
    is_sequence_model: bool = True,
    donate: bool = True,
    remat: bool = False,
):
    """Build a jitted train step.

    step(params, opt_state, rngs, voxels (T,N,H,W,C), frames (T,N,H,W,1),
         flows or None) -> (params, opt_state, loss_dict)

    For step models the forward is a lax.scan via run_sequence; for sequence
    models the model consumes the whole sequence. ``remat`` wraps the whole
    forward in jax.checkpoint — which only helps when the LOSS graph (e.g.
    LPIPS towers per step) dominates memory, NOT the model's scan residuals:
    grad-of-checkpoint re-materializes every scan step at once, same peak.
    For the real lever set ``remat: true`` in the BDE2VID model config —
    per-step nn.remat inside the scans (the TPU replacement for the
    reference's use_checkpoint + cpu_cache memory strategies, SURVEY §5.7);
    measured necessary to fit the full-scale flagship train step in HBM.
    """
    import optax

    loss_fn = make_loss_fn(
        model,
        loss_computer,
        lpips_params=lpips_params,
        is_sequence_model=is_sequence_model,
        remat=remat,
    )

    # donate params/opt_state buffers: the old trees are dead after the
    # update, so XLA reuses their HBM instead of holding both generations
    donate_argnums = (0, 1) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_argnums)
    def step(params, opt_state, rng, voxels, frames, flows):
        rngs = {"droppath": rng}
        (_, (loss_dict, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, voxels, frames, flows, rngs
        )
        # grads for non-"params" collections are zero (batch_stats are
        # written, not read, in train mode); the optimizer update is a
        # no-op on them and the fresh stats from the forward overwrite
        # whatever the update left (so the external params/opt_state trees
        # keep the full-variables layout callers already use)
        updates, opt_state = tx.update(grads, opt_state, params)
        new_vars = dict(optax.apply_updates(params, updates))
        new_vars.update(mut)
        return new_vars, opt_state, loss_dict

    return step


# ------------------------------ checkpoints ----------------------------------


def save_checkpoint_orbax(path: str, params, model_name: str, config: Dict) -> None:
    """Orbax checkpoint (async-capable, sharded-array-aware) — the
    production alternative to the msgpack format; same sidecar config."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(params))
    with open(path + ".json", "w") as fp:
        json.dump({"model": model_name, "config": config}, fp)


def load_checkpoint_orbax(path: str, dtype=jnp.float32):
    """Load an orbax checkpoint -> ModelSpec (mirror of load_checkpoint)."""
    import orbax.checkpoint as ocp

    from bde2vid_tpu.models.api import ModelSpec, build_model

    path = os.path.abspath(path)
    with open(path + ".json") as fp:
        meta = json.load(fp)
    name, config = meta["model"], meta["config"]
    model = build_model(name, config, dtype=dtype)
    is_seq = bool(getattr(model, "is_sequence_model", False))
    h = w = 64
    nb = int(config.get("num_bins", config.get("generator", {}).get("num_bins", 5)))
    voxel = jnp.zeros((2, 1, h, w, nb)) if is_seq else jnp.zeros((1, h, w, nb))
    target = model.init(jax.random.PRNGKey(0), voxel, model.initial_state(1, h, w))
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path, jax.device_get(target))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    gen_cfg = config.get("generator", config)
    return ModelSpec(
        name=name,
        module=model,
        params=params,
        num_bins=nb,
        num_encoders=int(gen_cfg.get("num_encoders", 3)),
        is_sequence_model=is_seq,
    )


def save_checkpoint(path: str, params, model_name: str, config: Dict) -> None:
    """Framework-native checkpoint: flax msgpack params + sidecar json config
    (the analog of the reference's embedded-config dialect, SURVEY §5.4)."""
    from flax import serialization

    params = jax.device_get(params)
    with open(path, "wb") as fp:
        fp.write(serialization.to_bytes(params))
    with open(path + ".json", "w") as fp:
        json.dump({"model": model_name, "config": config}, fp)


def load_checkpoint(path: str, dtype=jnp.float32):
    """Load a framework-native checkpoint -> ModelSpec."""
    from flax import serialization

    from bde2vid_tpu.models.api import ModelSpec, build_model

    with open(path + ".json") as fp:
        meta = json.load(fp)
    name, config = meta["model"], meta["config"]
    model = build_model(name, config, dtype=dtype)
    is_seq = bool(getattr(model, "is_sequence_model", False))
    h = w = 64
    nb = int(config.get("num_bins", config.get("generator", {}).get("num_bins", 5)))
    voxel = jnp.zeros((2, 1, h, w, nb)) if is_seq else jnp.zeros((1, h, w, nb))
    target = model.init(jax.random.PRNGKey(0), voxel, model.initial_state(1, h, w))
    with open(path, "rb") as fp:
        params = serialization.from_bytes(jax.device_get(target), fp.read())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    gen_cfg = config.get("generator", config)
    spec = ModelSpec(
        name=name,
        module=model,
        params=params,
        num_bins=nb,
        num_encoders=int(gen_cfg.get("num_encoders", 3)),
        is_sequence_model=is_seq,
    )
    return spec
