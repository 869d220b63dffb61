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

Multi-device serving: ``data_parallel=N`` exports the program SPMD-sharded
over an N-way ``"data"`` mesh (batch axis sharded, everything else
replicated — XLA GSPMD partitions the body; weights are baked in as
replicated constants). The export side needs NO devices — the shardings are
lowered against a ``jax.sharding.AbstractMesh``, so a single-chip (or
CPU-only) host can emit an N-chip bundle. The loader side rebuilds a
concrete mesh from its visible devices (:func:`serving_mesh`) and
:func:`run_voxels` commits inputs with ``Exported.in_shardings_jax`` before
calling. The batch must divide by N.

DP + Pallas compose via ``shard_map``: GSPMD cannot partition the opaque
``tpu_custom_call`` a Mosaic kernel lowers to, so Pallas-enabled DP exports
wrap the forward in ``jax.shard_map`` over the abstract mesh — each device
traces the kernel at its LOCAL batch shape and no partitioner ever sees the
custom call (the same construction ``parallel/sharded_eval.py`` proved
Pallas-safe for live eval, and ``tests/test_sharded_train.py`` for
training). shard_map artifacts must be invoked under ``jit``
(``ServingBundle.jitted`` / :func:`run_voxels` handle it — a bare
``Exported.call`` leaves Shardy's ``xla.sdy.GlobalToLocalShape`` custom
calls unresolved).

Sequence bundles additionally carry ``forward_tail``, a SHAPE-POLYMORPHIC
program (``jax.export`` symbolic time dimension) used to run a final
partial chunk at its TRUE length. Zero-padding the tail is NOT exact for
BDE2VID: padded frames reach real outputs through both the attention
buffer (encoded zero voxels have nonzero features — conv bias, LayerNorm
beta) and the backward recurrence (the backward ConvLSTM enters real
frames carrying state integrated over the padded frames), whereas the
eval driver runs the short chunk as-is (eval/driver.py; reference
eval_models_seq.py:216-219). The symbolic program makes chunked serving
bit-exact against the eval driver for any T.
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
# Mesh axis name baked into data-parallel bundles. The loader must rebuild
# its mesh with the SAME axis name (Exported.in_shardings_jax checks it);
# serving_mesh() is the single source of truth on both sides.
_MESH_AXIS = "data"


def _dp_mesh(data_parallel: int):
    """Export-time mesh: abstract, so no devices are needed to export."""
    from jax.sharding import AbstractMesh

    return AbstractMesh((data_parallel,), (_MESH_AXIS,))


def _batch_mask(tree, tree_bumped, batch_axis: int):
    """STRUCTURAL batch-leaf detection: ``tree_bumped`` is the same pytree
    built at batch+1 — a leaf is a batch leaf iff its shape changed, and
    then it must have changed exactly at ``batch_axis``. This replaces the
    old ``shape[batch_axis] == batch`` heuristic, which would silently
    shard a state leaf whose non-batch leading dim coincidentally equals
    the batch size (r4 advisor finding)."""

    def one(path, a, b):
        sa, sb = tuple(a.shape), tuple(b.shape)
        if sa == sb:
            return False
        ok = (
            len(sa) == len(sb)
            and len(sa) > batch_axis
            and all(x == y for i, (x, y) in enumerate(zip(sa, sb))
                    if i != batch_axis)
        )
        if not ok:
            raise ValueError(
                f"leaf {jax.tree_util.keystr(path)} changes shape {sa} -> "
                f"{sb} under a batch bump somewhere other than axis "
                f"{batch_axis}; cannot infer its data-parallel sharding"
            )
        return True

    return jax.tree_util.tree_map_with_path(one, tree, tree_bumped)


def _dp_shardings(mesh, mask_tree, batch_axis: int):
    """Per-leaf NamedShardings from a :func:`_batch_mask` tree: shard the
    batch axis of batch leaves, replicate everything else (e.g. EITR's
    scalar step counters)."""
    from jax.sharding import NamedSharding, PartitionSpec

    def one(is_batch):
        if is_batch:
            return NamedSharding(
                mesh, PartitionSpec(*([None] * batch_axis + [_MESH_AXIS]))
            )
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree_util.tree_map(one, mask_tree)


def serving_mesh(bundle_or_dp) -> "jax.sharding.Mesh":
    """Concrete loader-side mesh for a data-parallel bundle: the first
    ``data_parallel`` visible devices on a 1-D ``"data"`` axis (matching the
    abstract mesh the bundle was exported against)."""
    from jax.sharding import Mesh

    dp = bundle_or_dp if isinstance(bundle_or_dp, int) else int(
        bundle_or_dp.meta.get("data_parallel") or 1)
    devices = jax.devices()
    if len(devices) < dp:
        raise ValueError(
            f"bundle exported for {dp}-way data parallelism but only "
            f"{len(devices)} device(s) are visible"
        )
    return Mesh(np.asarray(devices[:dp]).reshape(dp), (_MESH_AXIS,))


def _uses_pallas(module) -> bool:
    from bde2vid_tpu.models.api import pallas_attention_enabled

    return pallas_attention_enabled(getattr(module, "config", None))


def _mosaic_live() -> bool:
    """Whether a Pallas-enabled model will actually trace Mosaic kernels on
    this host. Off TPU the attention modules fall back to interpret mode
    (nn/window_attention.py — pure-XLA jaxpr, same math), so an export from
    a CPU host carries no custom call and stays fully portable; it just
    won't use the fused kernel when later run on a TPU. Exporting the REAL
    kernel requires exporting from a TPU host."""
    return jax.devices()[0].platform == "tpu"


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
    _jitted: Dict[str, Any] = dataclasses.field(
        default_factory=dict, repr=False, compare=False
    )

    def call(self, name: str, *args):
        return self.functions[name].call(*args)

    def jitted(self, name: str):
        """Cached ``jax.jit``-wrapped call for ``name``. Required for
        shard_map artifacts (bare ``Exported.call`` leaves Shardy
        global-to-local custom calls unresolved); cached so repeated chunk
        calls reuse one trace."""
        if name not in self._jitted:
            self._jitted[name] = jax.jit(self.functions[name].call)
        return self._jitted[name]


def export_forward(
    spec,
    height: int,
    width: int,
    *,
    seq_len: int = 16,
    batch: int = 1,
    platforms: Sequence[str] = ("tpu", "cpu"),
    data_parallel: int = 1,
) -> Dict[str, jax_export.Exported]:
    """Export a ModelSpec's forward with params baked in.

    Returns ``{"forward": Exported}`` for sequence models (input
    ``(T, N, H, W, C)`` voxels) or ``{"step": Exported, "init_state":
    Exported}`` for per-step models (``step(state, voxel) -> (out_dict,
    state)``; ``init_state() -> state``). (H, W) must already be padded to
    the model's stride (``2^num_encoders`` — Croper semantics,
    reference utils_func/inference_utils.py:26-114).

    ``data_parallel=N`` shards the batch axis over an N-device ``"data"``
    mesh (abstract at export time — no devices needed to export). The
    artifact then requires N devices to run, with inputs committed to the
    loader's concrete mesh (:func:`run_voxels` / :func:`serving_mesh`
    handle this).
    """
    platforms = tuple(platforms)
    module, params = spec.module, spec.params
    disabled = ()
    use_pallas = _uses_pallas(module)
    if use_pallas and _mosaic_live():
        if platforms != ("tpu",):
            raise ValueError(
                "Pallas-enabled models lower to tpu_custom_call and can only "
                "be exported with platforms=('tpu',); rebuild the model with "
                "use_pallas_attention=False (eval CLI: --no-pallas) for a "
                f"portable artifact (requested platforms={platforms})"
            )
        disabled = (jax_export.DisabledSafetyCheck.custom_call(_TPU_CUSTOM_CALL),)
    if data_parallel > 1 and batch % data_parallel:
        raise ValueError(
            f"batch={batch} does not divide over data_parallel={data_parallel}"
        )
    mesh = _dp_mesh(data_parallel) if data_parallel > 1 else None

    nb = spec.num_bins
    dt = _input_dtype(module)

    def jit_sharded(fn, in_specs, in_specs_bumped, batch_axis):
        # jit with batch-axis shardings derived per leaf when data_parallel
        # is on; batch leaves are identified STRUCTURALLY by comparing the
        # specs against their batch+1 twins (inputs directly, outputs via
        # eval_shape at both batch sizes)
        if mesh is None:
            return jax.jit(fn)
        in_sh = tuple(
            _dp_shardings(mesh, _batch_mask(s, s2, batch_axis), batch_axis)
            for s, s2 in zip(in_specs, in_specs_bumped)
        )
        out_mask = _batch_mask(
            jax.eval_shape(fn, *in_specs),
            jax.eval_shape(fn, *in_specs_bumped),
            batch_axis,
        )
        out_sh = _dp_shardings(mesh, out_mask, batch_axis)
        return jax.jit(fn, in_shardings=in_sh, out_shardings=out_sh)

    if spec.is_sequence_model:
        vspec = jax.ShapeDtypeStruct((seq_len, batch, height, width, nb), dt)
        vspec2 = jax.ShapeDtypeStruct((seq_len, batch + 1, height, width, nb), dt)

        def forward(voxels):
            out, _ = module.apply(params, voxels, ())
            return out

        if mesh is not None and use_pallas:
            # shard_map, not GSPMD: the partitioner cannot split the opaque
            # tpu_custom_call, but inside shard_map each device traces the
            # kernel at its local batch shape (module docstring; same
            # construction as parallel/sharded_eval.py). Invoke shard_map
            # artifacts under jit (ServingBundle.jitted / run_voxels).
            from jax.sharding import NamedSharding, PartitionSpec

            from bde2vid_tpu.parallel.mesh import get_shard_map

            shard_map, rep_kw = get_shard_map()
            batch_p = PartitionSpec(None, _MESH_AXIS)
            out_mask = _batch_mask(
                jax.eval_shape(forward, vspec),
                jax.eval_shape(forward, vspec2),
                batch_axis=1,
            )
            out_specs = jax.tree_util.tree_map(
                lambda b: batch_p if b else PartitionSpec(), out_mask
            )
            # the jit needs EXPLICIT NamedShardings over the abstract mesh:
            # a bare jit(shard_map(...)) exports a 1-device program whose
            # Shardy global-to-local custom calls never resolve at load
            jit_fwd = jax.jit(
                shard_map(forward, mesh=mesh, in_specs=(batch_p,),
                          out_specs=out_specs, **rep_kw),
                in_shardings=NamedSharding(mesh, batch_p),
                out_shardings=jax.tree_util.tree_map(
                    lambda p: NamedSharding(mesh, p), out_specs
                ),
            )
        else:
            jit_fwd = jit_sharded(forward, (vspec,), (vspec2,), batch_axis=1)

        kw = dict(platforms=platforms, disabled_checks=list(disabled))
        fns = {"forward": jax_export.export(jit_fwd, **kw)(vspec)}
        # Shape-polymorphic tail program: symbolic T, so final partial
        # chunks run at their TRUE length — the only exact semantics for a
        # bidirectional model (module docstring). For GSPMD DP bundles the
        # tail keeps the batch shardings; for shard_map bundles it exports
        # as a plain SINGLE-device program (jaxlib's polymorphic-shape
        # refinement segfaults on manual-sharding modules) — a tail chunk
        # is one short residual call, so the loader runs it unsharded
        # (run_voxels pulls the tail input off the mesh).
        tail_jit = jax.jit(forward) if (mesh is not None and use_pallas) \
            else jit_fwd
        try:
            t_sym = jax_export.symbolic_shape("T")[0]
            vspec_t = jax.ShapeDtypeStruct(
                (t_sym, batch, height, width, nb), dt)
            fns["forward_tail"] = jax_export.export(tail_jit, **kw)(vspec_t)
        except Exception as e:  # pragma: no cover - depends on jax/model
            print(f"forward_tail (symbolic-T) export unavailable "
                  f"({type(e).__name__}: {e}); partial chunks will "
                  "zero-pad (NOT exact for bidirectional models)")
        return fns

    def _state_spec(n):
        return jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
            module.initial_state(n, height, width),
        )

    state_spec, state_spec2 = _state_spec(batch), _state_spec(batch + 1)
    vspec = jax.ShapeDtypeStruct((batch, height, width, nb), dt)
    vspec2 = jax.ShapeDtypeStruct((batch + 1, height, width, nb), dt)

    def step(state, voxel):
        out, new_state = module.apply(params, voxel, state)
        return out, new_state

    def init_state():
        return module.initial_state(batch, height, width)

    if mesh is None:
        init_jit = jax.jit(init_state)
    else:
        # zero-arg: only out_shardings (the fresh state lands batch-sharded;
        # the loader calls it under jax.set_mesh — run_voxels)
        init_jit = jax.jit(
            init_state,
            out_shardings=_dp_shardings(
                mesh, _batch_mask(state_spec, state_spec2, 0), 0
            ),
        )
    kw = dict(platforms=platforms, disabled_checks=list(disabled))
    return {
        "step": jax_export.export(
            jit_sharded(step, (state_spec, vspec), (state_spec2, vspec2),
                        batch_axis=0), **kw
        )(state_spec, vspec),
        "init_state": jax_export.export(init_jit, **kw)(),
    }


def export_spec_bundle(
    spec,
    height: int,
    width: int,
    *,
    seq_len: int = 16,
    batch: int = 1,
    platforms: Sequence[str] = ("tpu", "cpu"),
    data_parallel: int = 1,
) -> ServingBundle:
    """Build the standard bundle for a loaded ModelSpec."""
    fns = export_forward(
        spec, height, width, seq_len=seq_len, batch=batch, platforms=platforms,
        data_parallel=data_parallel,
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
        "data_parallel": data_parallel,
        # how partial chunks run: "exact" = the symbolic-T forward_tail
        # program at true length; "padded" = legacy zero-pad (not exact
        # for bidirectional models — export_forward docstring)
        "tail": "exact" if "forward_tail" in fns else (
            "padded" if spec.is_sequence_model else None),
        # which SPMD mechanism a DP bundle uses; shard_map artifacts must
        # be invoked under jit (ServingBundle.jitted)
        "dp_impl": None if data_parallel <= 1 else (
            "shard_map" if _uses_pallas(spec.module) else "gspmd"),
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
    when T equals the exported seq_len and the shape-polymorphic
    ``forward_tail`` program otherwise (exact partial chunks); step bundles
    scan the exported ``step`` from the exported ``init_state``.
    """
    voxels = jnp.asarray(voxels, jnp.float32)
    if voxels.ndim == 4:
        voxels = voxels[:, None]
    if voxels.ndim != 5:
        raise ValueError(f"expected (T,[N,]H,W,C) voxels, got {voxels.shape}")

    dp = int(bundle.meta.get("data_parallel") or 1)
    mesh = serving_mesh(dp) if dp > 1 else None

    if bundle.meta["kind"] == "sequence":
        name = "forward"
        seq_len = bundle.meta.get("seq_len")
        if seq_len is not None and voxels.shape[0] != seq_len:
            if "forward_tail" not in bundle.functions:
                raise ValueError(
                    f"sequence bundle exported at T={seq_len}, got "
                    f"T={voxels.shape[0]} and the bundle carries no "
                    "symbolic-T forward_tail program (legacy artifact); "
                    "pad/chunk to the exported length"
                )
            name = "forward_tail"
        fwd = bundle.functions[name]
        shard_mapped = bundle.meta.get("dp_impl") == "shard_map"
        if shard_mapped and name == "forward_tail":
            # shard_map bundles carry a single-device tail program (see
            # export_forward); run the short residual chunk unsharded
            out = fwd.call(jnp.asarray(np.asarray(voxels)))
        elif shard_mapped:
            if mesh is not None:
                voxels = jax.device_put(voxels, fwd.in_shardings_jax(mesh)[0])
            out = bundle.jitted(name)(voxels)
        else:
            if mesh is not None:
                voxels = jax.device_put(voxels, fwd.in_shardings_jax(mesh)[0])
            out = fwd.call(voxels)
        return np.asarray(out["image"])

    step_exp = bundle.functions["step"]

    def step_fn(carry, voxel):
        out, new_state = step_exp.call(carry, voxel)
        return new_state, out["image"]

    if mesh is None:
        state = bundle.call("init_state")
        _, images = jax.lax.scan(step_fn, state, voxels)
        return np.asarray(images)

    from jax.sharding import NamedSharding, PartitionSpec

    with jax.set_mesh(mesh):  # zero-arg init_state needs the device context
        state = bundle.call("init_state")
        # per-step voxel sharding (the LAST flat input leaf — state leaves
        # flatten first), with a replicated leading T axis
        v_sh = step_exp.in_shardings_jax(mesh)[-1]
        voxels = jax.device_put(
            voxels, NamedSharding(mesh, PartitionSpec(None, *v_sh.spec))
        )
        _, images = jax.lax.scan(step_fn, state, voxels)
    return np.asarray(images)
