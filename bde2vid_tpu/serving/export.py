"""AOT model export to portable StableHLO artifacts (``jax.export``).

Replaces the reference's deploy-the-source-tree story (its only way to run a
model elsewhere is to ship the repo + torch + the checkpoint and re-run
``load_model``, eval_models_seq.py:41-96) with compiler-native artifacts:

- :func:`export_forward` lowers a built model's forward to StableHLO with the
  parameters baked in as constants, for one or more target platforms
  (cross-platform lowering — a CPU host can produce a TPU artifact).
- :class:`ServingBundle` / :func:`save_bundle` / :func:`load_bundle` package
  the exported functions + metadata into a single zip file. A loader needs
  jax only — no bde2vid_tpu model code, no torch, no checkpoint dialects.
- :func:`run_voxels` drives a loaded bundle over a voxel sequence, for both
  model kinds: sequence models export ``forward`` (whole-sequence program);
  per-step recurrent models export ``step`` + ``init_state`` so a server can
  stream frames with explicit state (the exported ``step`` is jit-traceable,
  so the host may also wrap it in its own ``lax.scan``).

Pallas/Mosaic kernels lower to ``tpu_custom_call`` ops, which jax.export
gates behind an explicit compatibility opt-out (custom calls carry no
cross-version stability guarantee); exporting a Pallas-enabled BDE2VID
therefore requires ``platforms=("tpu",)`` and sets
``DisabledSafetyCheck.custom_call("tpu_custom_call")``. The default export
path uses the pure-XLA attention, which is fully portable.
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

FORMAT_VERSION = 1
# Mosaic's custom-call target (what Pallas TPU kernels lower to).
_TPU_CUSTOM_CALL = "tpu_custom_call"


def _uses_pallas(module) -> bool:
    from bde2vid_tpu.models.api import pallas_attention_enabled

    return pallas_attention_enabled(getattr(module, "config", None))


def _input_dtype(module) -> jnp.dtype:
    # Models cast inputs to their build dtype internally; exporting with a
    # float32 voxel spec keeps the artifact's ABI independent of the
    # internal compute dtype (bf16 models accept f32 voxels everywhere else
    # in the framework too — eval driver, trainer).
    return jnp.float32


@dataclasses.dataclass
class ServingBundle:
    """Named exported functions + metadata, ready to save or run."""

    functions: Dict[str, jax_export.Exported]
    meta: Dict[str, Any]

    def call(self, name: str, *args):
        return self.functions[name].call(*args)


def export_forward(
    spec,
    height: int,
    width: int,
    *,
    seq_len: int = 16,
    batch: int = 1,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Dict[str, jax_export.Exported]:
    """Export a ModelSpec's forward with params baked in.

    Returns ``{"forward": Exported}`` for sequence models (input
    ``(T, N, H, W, C)`` voxels) or ``{"step": Exported, "init_state":
    Exported}`` for per-step models (``step(state, voxel) -> (out_dict,
    state)``; ``init_state() -> state``). (H, W) must already be padded to
    the model's stride (``2^num_encoders`` — Croper semantics,
    reference utils_func/inference_utils.py:26-114).
    """
    platforms = tuple(platforms)
    module, params = spec.module, spec.params
    disabled = ()
    if _uses_pallas(module):
        if platforms != ("tpu",):
            raise ValueError(
                "Pallas-enabled models lower to tpu_custom_call and can only "
                "be exported with platforms=('tpu',); rebuild the model with "
                "use_pallas_attention=False (eval CLI: --no-pallas) for a "
                f"portable artifact (requested platforms={platforms})"
            )
        disabled = (jax_export.DisabledSafetyCheck.custom_call(_TPU_CUSTOM_CALL),)

    nb = spec.num_bins
    dt = _input_dtype(module)

    if spec.is_sequence_model:
        vspec = jax.ShapeDtypeStruct((seq_len, batch, height, width, nb), dt)

        def forward(voxels):
            out, _ = module.apply(params, voxels, ())
            return out

        exp = jax_export.export(
            jax.jit(forward), platforms=platforms, disabled_checks=list(disabled)
        )(vspec)
        return {"forward": exp}

    state0 = module.initial_state(batch, height, width)
    state_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), state0
    )
    vspec = jax.ShapeDtypeStruct((batch, height, width, nb), dt)

    def step(state, voxel):
        out, new_state = module.apply(params, voxel, state)
        return out, new_state

    def init_state():
        return module.initial_state(batch, height, width)

    kw = dict(platforms=platforms, disabled_checks=list(disabled))
    return {
        "step": jax_export.export(jax.jit(step), **kw)(state_spec, vspec),
        "init_state": jax_export.export(jax.jit(init_state), **kw)(),
    }


def export_spec_bundle(
    spec,
    height: int,
    width: int,
    *,
    seq_len: int = 16,
    batch: int = 1,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> ServingBundle:
    """Build the standard bundle for a loaded ModelSpec."""
    fns = export_forward(
        spec, height, width, seq_len=seq_len, batch=batch, platforms=platforms
    )
    meta = {
        "format_version": FORMAT_VERSION,
        "model": spec.name,
        "kind": "sequence" if spec.is_sequence_model else "step",
        "num_bins": spec.num_bins,
        "num_encoders": spec.num_encoders,
        "num_params": spec.num_params,
        "height": height,
        "width": width,
        "batch": batch,
        "seq_len": seq_len if spec.is_sequence_model else None,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "config": getattr(spec.module, "config", None),
        # SNN/SPADE checkpoints require LegacyNorm'd voxels (reference
        # sets args.normalize at load, eval_models_seq.py:91); recorded so
        # `run --h5` voxelizes with the right transform
        "normalize": bool(getattr(spec, "normalize", False)),
    }
    return ServingBundle(functions=fns, meta=meta)


def save_bundle(path: str, bundle: ServingBundle) -> None:
    """Write a bundle zip: ``meta.json`` + one ``fn/<name>.jaxexport`` per
    exported function (each entry is ``Exported.serialize()`` bytes)."""
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "meta.json",
            json.dumps({**bundle.meta, "functions": sorted(bundle.functions)},
                       indent=2, default=str),
        )
        for name, exp in bundle.functions.items():
            zf.writestr(f"fn/{name}.jaxexport", bytes(exp.serialize()))


def load_bundle(path: str) -> ServingBundle:
    """Load a bundle zip back into callable form. Requires only jax: the
    artifacts rehydrate via ``jax.export.deserialize`` — model source and
    checkpoints are not consulted."""
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        fns = {}
        for name in meta.get("functions", []):
            fns[name] = jax_export.deserialize(
                bytearray(zf.read(f"fn/{name}.jaxexport"))
            )
    return ServingBundle(functions=fns, meta=meta)


def run_voxels(bundle: ServingBundle, voxels) -> np.ndarray:
    """Run a loaded bundle over a voxel sequence.

    ``voxels``: ``(T, H, W, C)`` or ``(T, N, H, W, C)`` float array, already
    padded to the bundle's (height, width). Returns stacked images
    ``(T, N, H, W, 1)``. Sequence bundles call the whole-sequence program
    (T must equal the exported seq_len); step bundles scan the exported
    ``step`` from the exported ``init_state``.
    """
    voxels = jnp.asarray(voxels, jnp.float32)
    if voxels.ndim == 4:
        voxels = voxels[:, None]
    if voxels.ndim != 5:
        raise ValueError(f"expected (T,[N,]H,W,C) voxels, got {voxels.shape}")

    if bundle.meta["kind"] == "sequence":
        out = bundle.call("forward", voxels)
        return np.asarray(out["image"])

    state = bundle.call("init_state")
    step_exp = bundle.functions["step"]

    def step_fn(carry, voxel):
        out, new_state = step_exp.call(carry, voxel)
        return new_state, out["image"]

    _, images = jax.lax.scan(step_fn, state, voxels)
    return np.asarray(images)
