"""The common functional model protocol + sequence runner + registry.

Replaces the reference's three state conventions (attribute state with
``reset_states()``, explicit prev_states threading, and mmengine wrappers —
see eval_models_seq.py:41-96) with ONE:

    out_dict, new_state = model.apply(params, voxel, state)
    state0 = model.initial_state(batch, H, W)

and one TPU-native sequence runner: ``lax.scan`` over time with the state as
the carry. All five model families run through the same scan; XLA compiles
the whole sequence into a single program with donated carries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls

    return deco


def build_model(name: str, config: Dict[str, Any], **kwargs):
    """Instantiate a registered model family by name (the framework's single
    config surface, replacing the reference's three coexisting systems)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](config=config, **kwargs)


def pallas_attention_enabled(config) -> bool:
    """Nested lookup of ``use_pallas_attention`` (top level or inside
    ``generator`` — both spellings occur in checkpoint sidecar configs).
    The single home of this lookup: the eval CLI, the serving CLI, and the
    exporter all resolve the flag through here."""
    config = config or {}
    return bool(
        config.get(
            "use_pallas_attention",
            config.get("generator", {}).get("use_pallas_attention", False),
        )
    )


def set_pallas_attention(spec, enabled: bool, dtype=None):
    """Rebuild ``spec.module`` with the fused-attention flag when it differs
    from the checkpoint's baked value — disabling matters as much as
    enabling (a checkpoint trained with the kernel must honor --no-pallas
    and the auto-off on non-TPU hosts). Params are untouched: the flag only
    changes which attention implementation the module dispatches to. No-op
    for families without the kernel."""
    if spec.name != "BDE2VID":
        return spec
    cfg = dict(spec.module.config)
    if pallas_attention_enabled(cfg) == bool(enabled):
        return spec
    cfg["use_pallas_attention"] = bool(enabled)
    kwargs = {} if dtype is None else {"dtype": dtype}
    spec.module = build_model("BDE2VID", cfg, **kwargs)
    return spec


@dataclasses.dataclass
class ModelSpec:
    """A built model + its params: everything needed to run sequences."""

    name: str
    module: Any  # flax module
    params: Any  # frozen params pytree (may include batch_stats collection)
    num_bins: int = 5
    num_encoders: int = 0  # for Croper spatial padding (2^num_encoders)
    is_sequence_model: bool = False  # BDE2VID-style whole-sequence forward

    @property
    def num_params(self) -> int:
        """Trainable parameter count (reference models log this at load,
        e2vid/base_model.py:28-35)."""
        import numpy as np

        leaves = jax.tree_util.tree_leaves(self.params.get("params", self.params))
        return int(sum(np.prod(l.shape) for l in leaves))

    def initial_state(self, batch: int, height: int, width: int):
        return self.module.initial_state(batch, height, width)

    def step(self, voxel: Array, state):
        return self.module.apply(self.params, voxel, state)


def run_sequence(
    module,
    params,
    voxels: Array,
    state,
    unroll: int = 1,
) -> Tuple[Array, Any]:
    """Run a per-step model over a [T, N, H, W, C] voxel sequence.

    One ``lax.scan``: the recurrent state is the carry, per-step images are
    stacked. This is the TPU replacement for the reference's Python loop over
    ``model({'events': ...})`` (eval_models_seq.py:209-213) — the whole
    sequence is one XLA program, weights stay resident in HBM/VMEM, and the
    carry is donated.
    """

    def step_fn(carry, voxel):
        out, new_state = module.apply(params, voxel, carry)
        return new_state, out["image"]

    final_state, images = jax.lax.scan(step_fn, state, voxels, unroll=unroll)
    return images, final_state


def run_sequence_chunked(
    module,
    params,
    voxels: Array,
    state,
    chunk: int = 1000,
) -> Array:
    """Chunked variant mirroring the reference's subseq_L behavior
    (eval_models_seq.py:216-219): state RESETS between chunks (the reference
    calls reset_states() inside forward, bde2vid.py:31), so chunks are
    independent — which also makes them trivially parallelizable across
    devices.
    """
    t = voxels.shape[0]
    outs = []
    for s in range(0, t, chunk):
        imgs, _ = run_sequence(module, params, voxels[s : s + chunk], state)
        outs.append(imgs)
    return jnp.concatenate(outs, axis=0)
