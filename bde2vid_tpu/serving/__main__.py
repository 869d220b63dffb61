"""Serving CLI: export checkpoints to AOT bundles, run bundles on voxels.

    python -m bde2vid_tpu.serving export --weights model.pth \
        --out model.bundle.zip --hw 180 240 [--T 16] [--platforms tpu,cpu]
    python -m bde2vid_tpu.serving run --bundle model.bundle.zip \
        {--voxels voxels.npy | --h5 seq.h5} [--out_dir imgs/]

``export`` accepts every checkpoint dialect the eval CLI does (torch
mmengine/template/bare/SNN via eval/checkpoint.py, framework msgpack/orbax
via train/trainer.py) and emits a source-free StableHLO bundle. ``run``
loads ``voxels.npy`` ((T, H, W, C) float) — or voxelizes a canonical event
h5 through the standard device pipeline with ``--h5`` — pads to the
bundle's exported spatial shape (eval-driver Croper semantics), runs,
crops back, and writes PNGs: a minimal reference server loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_spec(path: str, bf16: bool, pallas: bool):
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    path = path.rstrip(os.sep)  # shell tab-completion appends / to dirs
    if path.endswith(".msgpack"):
        from bde2vid_tpu.train import load_checkpoint

        spec = load_checkpoint(path, dtype=dtype)
    elif os.path.isdir(path) and os.path.exists(path + ".json"):
        # orbax checkpoint directory with the trainer's sidecar config
        from bde2vid_tpu.train.trainer import load_checkpoint_orbax

        spec = load_checkpoint_orbax(path, dtype=dtype)
    else:
        from bde2vid_tpu.eval.checkpoint import load_model_from_torch

        spec = load_model_from_torch(path, dtype=dtype)
    # Portability default: pure-XLA attention (Pallas lowers to
    # tpu_custom_call, which pins the artifact to platforms=tpu and
    # carries no cross-version stability guarantee — serving/export.py).
    from bde2vid_tpu.models.api import set_pallas_attention

    return set_pallas_attention(spec, pallas, dtype=dtype)


def cmd_export(args) -> int:
    from bde2vid_tpu.serving.export import export_spec_bundle, save_bundle
    from bde2vid_tpu.utils.padding import optimal_crop_size

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    spec = _load_spec(args.weights, args.bf16, args.pallas)
    h, w = args.hw
    # the RAW num_encoders (2^0 = 1 means no padding for FireNet-class
    # models) — cmd_run recomputes CropParameters with the same value from
    # bundle meta, so export and run must agree on the factor
    factor = spec.num_encoders
    ph = optimal_crop_size(h, factor)
    pw = optimal_crop_size(w, factor)
    if (ph, pw) != (h, w):
        print(f"padding exported shape {h}x{w} -> {ph}x{pw} "
              f"(/2^{factor} stride; Croper semantics)")
    bundle = export_spec_bundle(
        spec, ph, pw, seq_len=args.T, batch=args.batch, platforms=platforms,
        data_parallel=args.dp,
    )
    # record the pre-pad sensor shape so `run` can crop outputs back
    bundle.meta["sensor_height"], bundle.meta["sensor_width"] = h, w
    save_bundle(args.out, bundle)
    size = os.path.getsize(args.out)
    print(json.dumps({
        "out": args.out, "bytes": size, "model": spec.name,
        "kind": bundle.meta["kind"], "platforms": list(platforms),
        "exported_hw": [ph, pw], "num_params": spec.num_params,
        "data_parallel": args.dp,
    }))
    return 0


def cmd_run(args) -> int:
    from bde2vid_tpu.serving.export import load_bundle, run_voxels

    from bde2vid_tpu.utils.padding import CropParameters

    bundle = load_bundle(args.bundle)
    if args.h5:
        # events -> voxels through the standard device pipeline (same
        # between-frames windowing + fused-scatter voxelizer the eval
        # driver uses), then into the bundle: a whole serving path that
        # needs no model source
        from bde2vid_tpu.data import load_sequence

        seq = load_sequence(
            args.h5,
            num_bins=bundle.meta["num_bins"],
            normalize=bundle.meta.get("normalize", False),
        )
        vox = np.asarray(seq.voxels())  # (T, C, H, W)
        voxels = np.transpose(vox, (0, 2, 3, 1))[:, None]
    else:
        voxels = np.load(args.voxels)
    if voxels.ndim == 4:
        voxels = voxels[:, None]
    t, n, h, w, c = voxels.shape
    ph, pw = bundle.meta["height"], bundle.meta["width"]
    if n != bundle.meta["batch"]:
        raise SystemExit(
            f"bundle exported at batch={bundle.meta['batch']}, got N={n}")
    if c != bundle.meta["num_bins"]:
        raise SystemExit(
            f"bundle exported for num_bins={bundle.meta['num_bins']} voxel "
            f"channels, got C={c}")
    # the SAME pad/crop object the eval driver uses (ceil on top/left —
    # the reference ZeroPad2d parity trap, utils/padding.py), so serving
    # and eval see identical zero borders for identical inputs
    cp = CropParameters(w, h, bundle.meta["num_encoders"])
    if (cp.height_crop_size, cp.width_crop_size) != (ph, pw):
        raise SystemExit(
            f"voxels {h}x{w} pad to {cp.height_crop_size}x"
            f"{cp.width_crop_size} but the bundle was exported at {ph}x{pw} "
            f"(sensor {bundle.meta.get('sensor_height')}x"
            f"{bundle.meta.get('sensor_width')})")
    voxels = np.pad(voxels, ((0, 0), (0, 0),
                             (cp.padding_top, cp.padding_bottom),
                             (cp.padding_left, cp.padding_right), (0, 0)))
    L = bundle.meta.get("seq_len")
    if bundle.meta["kind"] == "sequence" and t != L:
        # chunk to the exported length — the eval driver's subseq_L
        # semantics (chunks are state-reset-independent in the reference,
        # eval_models_seq.py:216-219, so a whole-sequence program per full
        # chunk is exact). The final PARTIAL chunk runs at its TRUE length
        # through the bundle's symbolic-T forward_tail program — the eval
        # driver runs a short chunk, and zero-padding is NOT equivalent for
        # bidirectional models (padded frames leak into real outputs via
        # the attention buffer and the backward recurrence —
        # serving/export.py module docstring).
        has_tail = "forward_tail" in bundle.functions
        outs = []
        for s in range(0, t, L):
            blk = voxels[s:s + L]
            k = blk.shape[0]
            if k < L and not has_tail:
                # legacy bundle without the symbolic-T program: zero-pad
                # and warn — tail frames within the attention buffer's
                # reach of the end can diverge from the eval driver
                print(f"warning: zero-padding the final {k}-frame chunk to "
                      f"the exported T={L} (bundle has no forward_tail "
                      "program); tail outputs are approximate for "
                      "bidirectional models", file=sys.stderr)
                blk = np.pad(blk, ((0, L - k),) + ((0, 0),) * 4)
                outs.append(run_voxels(bundle, blk)[:k])
            else:
                outs.append(run_voxels(bundle, blk))
        images = np.concatenate(outs, axis=0)
    else:
        images = run_voxels(bundle, voxels)  # (T, N, ph, pw, 1)
    images = images[:, :, cp.iy0:cp.iy1, cp.ix0:cp.ix1, 0]
    print(f"ran {t} frames: image range [{images.min():.4f}, "
          f"{images.max():.4f}]")
    if args.out_dir:
        from bde2vid_tpu.metrics.lpips_util import save_image

        os.makedirs(args.out_dir, exist_ok=True)
        for i in range(t):
            img = np.clip(images[i, 0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            save_image(img, os.path.join(args.out_dir, f"frame_{i:06d}.png"))
        print(f"wrote {t} PNGs to {args.out_dir}")
    return 0


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m bde2vid_tpu.serving")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("export", help="checkpoint -> AOT bundle zip")
    pe.add_argument("--weights", required=True,
                    help="checkpoint: .pth (all torch dialects), .msgpack, "
                    "or an orbax checkpoint directory")
    pe.add_argument("--out", required=True, help="output bundle zip path")
    pe.add_argument("--hw", nargs=2, type=int, required=True,
                    metavar=("H", "W"), help="sensor shape (padded to stride)")
    pe.add_argument("--T", type=int, default=16,
                    help="sequence length for sequence models")
    pe.add_argument("--batch", type=int, default=1)
    pe.add_argument("--platforms", default="tpu,cpu")
    pe.add_argument("--dp", type=int, default=1,
                    help="data-parallel devices: shard the batch over an "
                    "N-device mesh (the bundle then requires N devices; "
                    "export itself needs none — abstract-mesh lowering). "
                    "Composes with --pallas via a shard_map-wrapped export")
    pe.add_argument("--bf16", action="store_true")
    pe.add_argument("--pallas", action="store_true",
                    help="export the fused Pallas attention (tpu-only artifact)")
    pe.set_defaults(fn=cmd_export)

    pr = sub.add_parser("run", help="run a bundle over voxels.npy or an event h5")
    pr.add_argument("--bundle", required=True)
    src = pr.add_mutually_exclusive_group(required=True)
    src.add_argument("--voxels", default=None,
                     help=".npy of (T, H, W, C) float voxels")
    src.add_argument("--h5", default=None,
                     help="canonical event h5: voxelized on device via the "
                     "standard between-frames pipeline, then served")
    pr.add_argument("--out_dir", default=None, help="write per-frame PNGs")
    pr.set_defaults(fn=cmd_run)
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
