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
        # a LIST of (type, fn) pairs, not a type-keyed dict: the reference's
        # summed-loss-list convention permits the same type twice (e.g. two
        # L1 terms at different weights) — a dict would silently drop all
        # but the last entry and train a different objective than configured
        self.losses = [(cfg["type"], build_loss(cfg)) for cfg in losses_cfg]
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

    def _short_names(self):
        """Display keys for loss_dict; duplicate types get an index suffix
        so two same-type entries report separately instead of colliding."""
        seen: Dict[str, int] = {}
        out = []
        for name, _ in self.losses:
            short = "L_" + "".join(c for c in name if c.isupper())
            k = seen.get(short, 0)
            seen[short] = k + 1
            out.append(short if k == 0 else f"{short}{k + 1}")
        return out

    def _has(self, type_name: str) -> bool:
        return any(n == type_name for n, _ in self.losses)

    def __call__(
        self,
        lpips_params,
        preds: Array,  # (T, N, H, W, 1)
        gts: Array,  # (T, N, H, W, 1)
        flows: Optional[Array] = None,  # (T, N, H, W, 2)
    ) -> Tuple[Array, Dict[str, Array]]:
        T = preds.shape[0]
        gate = self._gate(T)
        if self._has("TemporalConsistencyLoss") and flows is None:
            # same clear error the scan path raises — without it the
            # unrolled path dies on flows[t] with a bare TypeError
            raise ValueError("TemporalConsistencyLoss requires flows")
        if int(gate.sum()) > self.unroll_threshold:
            return self._call_scan(lpips_params, preds, gts, flows, gate)
        J = len(self.losses)
        sums = [jnp.zeros(()) for _ in range(J)]
        counts = [jnp.zeros(()) for _ in range(J)]
        vip_states: Dict[int, Any] = {}  # per-instance VIP feature state

        prev_gt = prev_pd = None
        for t in range(T):  # static unroll: loss graph is cheap vs model fwd
            cur_pd, cur_gt = preds[t], gts[t]
            if gate[t]:
                for j, (name, fn) in enumerate(self.losses):
                    if name in ("PerceptualLoss", "L1Loss"):
                        v, _ = fn(lpips_params, cur_pd, cur_gt)
                    elif name == "VIPLoss":
                        v, vip_states[j] = fn(
                            lpips_params, cur_pd, cur_gt, vip_states.get(j)
                        )
                    elif name == "TemporalConsistencyLoss":
                        if t <= fn.L0 or prev_gt is None:
                            continue
                        v, _ = fn(
                            lpips_params, prev_gt, cur_gt, prev_pd, cur_pd, flows[t]
                        )
                    else:
                        raise ValueError(f"unknown loss {name}")
                    sums[j] = sums[j] + v
                    counts[j] = counts[j] + 1.0
            prev_gt, prev_pd = cur_gt, cur_pd

        loss_dict = {}
        total = jnp.zeros(())
        for j, short in enumerate(self._short_names()):
            mean = sums[j] / jnp.maximum(counts[j], 1.0)
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
        gate_f = jnp.asarray(gate, jnp.float32)
        prev_preds = jnp.concatenate([preds[:1], preds[:-1]])
        prev_gts = jnp.concatenate([gts[:1], gts[:-1]])

        # per-INSTANCE gates (T, J): TemporalConsistency entries each apply
        # their own (t > L0, t >= 1) window on top of the loss_inds gate
        t_idx = np.arange(T)
        gates = []
        for name, fn in self.losses:
            if name == "TemporalConsistencyLoss":
                if flows is None:
                    raise ValueError("TemporalConsistencyLoss requires flows")
                gates.append(
                    gate_f
                    * jnp.asarray((t_idx > fn.L0) & (t_idx >= 1), jnp.float32)
                )
            else:
                gates.append(gate_f)
        gates = jnp.stack(gates, axis=1)  # (T, J)
        if flows is None:
            flows = jnp.zeros((T, 1, 1, 1, 2), preds.dtype)

        # per-INSTANCE VIP feature states (duplicate VIPLoss entries must
        # not share a temporal cache)
        def _vip_placeholder(fn):
            ph = jax.eval_shape(
                lambda p, a, b: fn(p, a, b, None)[1], lpips_params, preds[0], gts[0]
            )
            return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), ph)

        vip_state0 = tuple(
            _vip_placeholder(fn) if name == "VIPLoss" else ()
            for name, fn in self.losses
        )

        def body(carry, x):
            vip_states, vip_seen, sums, counts = carry
            pd, gt, ppd, pgt, fl, gates_t = x
            vip_states = list(vip_states)
            new_sums, new_counts = [], []
            for j, (name, fn) in enumerate(self.losses):
                gj = gates_t[j]
                if name in ("PerceptualLoss", "L1Loss"):
                    v, _ = fn(lpips_params, pd, gt)
                elif name == "VIPLoss":
                    v, new_state = fn.step(
                        lpips_params, pd, gt, vip_states[j], vip_seen
                    )
                    vip_states[j] = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(gj > 0, n, o), new_state, vip_states[j]
                    )
                    vip_seen = jnp.logical_or(vip_seen, gj > 0)
                elif name == "TemporalConsistencyLoss":
                    v, _ = fn(lpips_params, pgt, gt, ppd, pd, fl)
                else:
                    raise ValueError(f"unknown loss {name}")
                new_sums.append(sums[j] + gj * v)
                new_counts.append(counts[j] + gj)
            return (
                tuple(vip_states),
                vip_seen,
                jnp.stack(new_sums),
                jnp.stack(new_counts),
            ), None

        carry0 = (
            vip_state0,
            jnp.asarray(False),
            jnp.zeros((len(self.losses),)),
            jnp.zeros((len(self.losses),)),
        )
        (_, _, sums, counts), _ = jax.lax.scan(
            body, carry0, (preds, gts, prev_preds, prev_gts, flows, gates)
        )

        loss_dict = {}
        total = jnp.zeros(())
        for j, short in enumerate(self._short_names()):
            mean = sums[j] / jnp.maximum(counts[j], 1.0)
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
        base = {k: v for k, v in variables.items() if k != "batch_stats"}
        T = voxels.shape[0]

        # both step-model branches thread rngs, each scan step with a FRESH
        # fold_in(key, t) — reusing one key per step would time-correlate
        # any stochastic layer (droppath-style), and dropping rngs entirely
        # (the old stat-free path via run_sequence) would crash a step
        # model that calls make_rng
        def step_fn(carry, xs):
            voxel, t = xs
            state, bstats = carry
            step_rngs = {k: jax.random.fold_in(r, t) for k, r in (rngs or {}).items()}
            if has_stats:
                (out, new_state), mut = model.apply(
                    {**base, "batch_stats": bstats},
                    voxel,
                    state,
                    rngs=step_rngs,
                    mutable=["batch_stats"],
                )
                return (new_state, mut["batch_stats"]), out["image"]
            out, new_state = model.apply(variables, voxel, state, rngs=step_rngs)
            return (new_state, bstats), out["image"]

        bstats0 = variables["batch_stats"] if has_stats else ()
        (_, final_stats), imgs = jax.lax.scan(
            step_fn, (state0, bstats0), (voxels, jnp.arange(T))
        )
        return imgs, ({"batch_stats": final_stats} if has_stats else {})

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


def _checkpoint_target(path: str, dtype):
    """Shared sidecar-parse + model-build for both checkpoint formats:
    reads ``<path>.json``, builds the model, dummy-inits the parameter
    tree (the restore target), and returns ``(target, make_spec)`` where
    ``make_spec(params)`` assembles the ModelSpec. Keeping this in ONE
    place means the num_bins fallback chain / init shapes cannot drift
    between the msgpack and orbax loaders."""
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
    gen_cfg = config.get("generator", config)

    def make_spec(params):
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return ModelSpec(
            name=name,
            module=model,
            params=params,
            num_bins=nb,
            num_encoders=int(gen_cfg.get("num_encoders", 3)),
            is_sequence_model=is_seq,
        )

    return target, make_spec


def load_checkpoint_orbax(path: str, dtype=jnp.float32):
    """Load an orbax checkpoint -> ModelSpec (mirror of load_checkpoint)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    target, make_spec = _checkpoint_target(path, dtype)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path, jax.device_get(target))
    return make_spec(params)


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

    target, make_spec = _checkpoint_target(path, dtype)
    with open(path, "rb") as fp:
        params = serialization.from_bytes(jax.device_get(target), fp.read())
    return make_spec(params)


# --------------------------- exact-resume state -------------------------------


def save_train_state_orbax(
    path: str, params, opt_state, step: int, key, model_name: str, config: Dict
) -> None:
    """Full train-state checkpoint: params + optimizer state + step counter
    + PRNG key in ONE orbax tree, for bit-exact resume (the params-only
    formats reinitialize Adam moments, so a resumed run diverges from the
    uninterrupted one; this one does not — tests/test_train_state.py).

    Leaves are written as the jax.Arrays they are — NO host gather — so a
    multi-device train loop (replicated params on a data/spatial mesh)
    checkpoints in place; orbax records shardings natively. The sidecar
    json carries ``train_state: true`` so loaders can tell the formats
    apart (``is_train_state``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    state = {
        "params": params,
        "opt_state": opt_state,
        "step": jnp.asarray(int(step), jnp.int32),
        "key": key,
    }
    with ocp.StandardCheckpointer() as ckptr:
        # force: overwrite an existing state dir (re-running into the same
        # out_dir must not crash at checkpoint time, hours into training)
        ckptr.save(path, state, force=True)
    with open(path + ".json", "w") as fp:
        json.dump({"model": model_name, "config": config, "train_state": True}, fp)


def is_train_state(path: str) -> bool:
    """True if ``path`` is a full train-state checkpoint (vs params-only)."""
    try:
        with open(path.rstrip(os.sep) + ".json") as fp:
            return bool(json.load(fp).get("train_state"))
    except (OSError, ValueError):
        return False


def restore_train_state_orbax(path: str, tx, dtype=jnp.float32, mesh=None):
    """Restore a full train state -> ``(spec, opt_state, step, key)``.

    ``tx`` must be the same optax transform used at save time (the
    opt_state tree is its structure). With ``mesh``, every leaf restores
    replicated onto it (``NamedSharding(mesh, P())`` — the parameter
    layout of the framework's data/spatial-parallel train steps), landing
    on-device without a host round trip; without it, leaves restore as
    host arrays and the first jitted step places them."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path.rstrip(os.sep))
    target_params, make_spec = _checkpoint_target(path, dtype)
    target = {
        "params": target_params,
        "opt_state": tx.init(target_params),
        "step": jnp.zeros((), jnp.int32),
        "key": jax.random.PRNGKey(0),
    }
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec())
        target = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a),
                                           sharding=sh),
            target,
        )
    else:
        target = jax.device_get(target)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, target)
    spec = make_spec(state["params"])
    return spec, state["opt_state"], int(state["step"]), jnp.asarray(state["key"])
