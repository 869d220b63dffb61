"""Evaluation CLI — the reference entry point surface, TPU-native.

Usage (reference: python eval_models_seq.py --weights_dir W --data_dir D):

    python -m bde2vid_tpu.eval --weights_dir W --data_dir D [--st N --ed M]

The reference hard-codes ~20 config attrs in __main__ (eval_models_seq.py:
300-322); those are explicit flags here with the same defaults.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from glob import glob

import jax.numpy as jnp


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="evaluate reconstruction models on event h5 datasets")
    p.add_argument("--weights_dir", default="weights/", type=str)
    p.add_argument("--data_dir", default="data/eval/", type=str)
    p.add_argument("--st", default=0, type=int)
    p.add_argument("--ed", default=-1, type=int)
    # reference hard-coded block, surfaced as flags (same defaults)
    p.add_argument("--datatype", default="org")
    p.add_argument("--datasets", nargs="*", default=["HQF/", "ECD/", "MVSEC/"])
    p.add_argument("--metrics", nargs="*", default=["p_loss", "mse", "ssim"])
    p.add_argument("--subseq_L", default=1000, type=int)
    p.add_argument("--max_length", default=111200, type=int)
    p.add_argument("--pause_st", default=None, type=int)
    p.add_argument("--pause_ed", default=None, type=int)
    p.add_argument("--loader_type", default="H5",
                   choices=["H5", "SpadeH5", "MMP", "NPY", "ENPY", "H5VOX"],
                   help="dataset backend (reference ltype; H5VOX reads the "
                   "in-h5 voxel cache written by h5_precompute_voxels)")
    p.add_argument("--separate_polarity", action="store_true",
                   help="2B-channel pos/neg voxel grids instead of combined")
    p.add_argument("--filter_hot_events", action="store_true")
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--eq", action="store_true")
    p.add_argument("--saveim", default=None, type=str, help="folder to dump triptych PNGs")
    p.add_argument("--show", action="store_true",
                   help="live [events|pred|gt] cv2 window; ESC quits")
    p.add_argument("--wait_time", default=1, type=int,
                   help="cv2.waitKey ms per frame for --show")
    p.add_argument("--output_dir", default=None, type=str,
                   help="where result files go (default: weights_dir)")
    p.add_argument("--lpips_lin", default=None, type=str,
                   help="torch .pth with LPIPS lin heads (v0.1 alex layout); "
                   "auto-discovered ($BDE2VID_LPIPS_LIN, weights/lpips/, "
                   "reference mirror) when omitted")
    p.add_argument("--lpips_backbone", default=None, type=str,
                   help="torch state dict with torchvision alexnet features.* "
                   "(required for paper-parity p_loss; lin heads alone use a "
                   "randomly initialized backbone)")
    p.add_argument("--shard_data", action="store_true",
                   help="shard subseq_L chunks over all visible devices "
                   "(exact: chunk state resets make them independent)")
    p.add_argument("--bf16", action="store_true", help="run models in bfloat16")
    p.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas window-attention kernels (BDE2VID). "
                   "Default: ON when the backend is a real TPU — the f32 "
                   "kernel is the numerically EXACT side of the fused-vs-XLA "
                   "comparison (HIGHEST-precision dots, bit-exact vs the "
                   "precision-pinned twin on chip; docs/DESIGN.md) and ~2x "
                   "faster — OFF elsewhere (interpret mode is slow). "
                   "--no-pallas forces the pure-XLA attention path")
    return p


def resolve_pallas(flag, model_name: str) -> bool:
    """Resolve the tri-state --pallas flag (None = auto) for a model.

    Auto enables the fused kernels for BDE2VID on a real TPU: they are
    strictly better there — ~2x faster at f32 AND the more exact side of
    the fused-vs-XLA comparison (every kernel dot runs precision=HIGHEST
    for f32 operands; bit-exact vs the precision-pinned twin on chip,
    while the XLA default path carries single-bf16-pass MXU rounding —
    docs/DESIGN.md "The f32 gap is attributed"). Off-TPU the kernels
    would run in slow interpret mode, so auto keeps XLA attention."""
    if model_name != "BDE2VID":
        return False
    if flag is not None:
        return flag
    import jax

    return jax.devices()[0].platform == "tpu"


def read_checkpoints(weights_dir: str, st: int, ed: int):
    """Glob + sort checkpoints by epoch number (reference read_cps :346-360)."""
    files = glob(os.path.join(weights_dir, "*.pth")) + glob(
        os.path.join(weights_dir, "*.msgpack")
    )

    def parse_num(x):
        # parse the BASENAME: the directory path may itself contain "epoch_"
        name = os.path.basename(x)
        if "epoch_" in name:
            m = re.search(r"\d+", name.split("epoch_")[-1])
            if m:
                # numeric sort (epoch_9 before epoch_10); tuple keys keep
                # numeric and non-numeric names mutually sortable
                return (0, int(m[0]), name)
        return (1, 0, name)

    files.sort(key=parse_num)
    if st > 0 or ed > -1:
        files = files[st if st > 0 else 0 : ed if ed > -1 else len(files)]
    return files


def read_datafiles(data_dir: str, datasets, loader_type: str = "H5"):
    subdir = (
        "h5"
        if loader_type in ("H5", "SpadeH5", "H5VOX")
        else "npy" if loader_type in ("NPY", "ENPY") else "mmp"
    )
    root = os.path.join(data_dir, subdir)
    listing = os.path.join(root, "eval_data.txt")
    if os.path.exists(listing):
        with open(listing) as f:
            files = [l for l in f.read().split("\n") if l]
    elif loader_type in ("H5", "SpadeH5", "H5VOX"):  # fall back to walking the tree
        files = sorted(  # glob order is filesystem-dependent; keep results diffable
            os.path.relpath(p, root)
            for p in glob(os.path.join(root, "**", "*.h5"), recursive=True)
        )
    else:  # directory-per-sequence backends
        files = sorted(
            os.path.relpath(os.path.dirname(p), root)
            for p in glob(os.path.join(root, "**", "t.npy"), recursive=True)
        ) or sorted(
            os.path.relpath(d, root)
            for d in glob(os.path.join(root, "*", "*"))
            if os.path.isdir(d)
        )
    keep = lambda f: any(d in f for d in datasets)
    return [f for f in files if keep(f)], root


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    from bde2vid_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch
    from bde2vid_tpu.eval.driver import EvalConfig, evaluate_all
    from bde2vid_tpu.metrics.lpips import (
        LPIPS,
        find_default_lpips_lin,
        load_lpips_params,
    )

    lpips_lin = args.lpips_lin
    if lpips_lin is None and "p_loss" in args.metrics:
        lpips_lin = find_default_lpips_lin()
        if lpips_lin:
            print(f"lpips: using discovered lin weights {lpips_lin}")

    lpips_pair = None
    if lpips_lin:
        from bde2vid_tpu.eval.checkpoint import load_torch_file, _to_numpy_state

        lin = _to_numpy_state(load_torch_file(lpips_lin))
        backbone = (
            _to_numpy_state(load_torch_file(args.lpips_backbone))
            if args.lpips_backbone
            else None
        )
        if backbone is None:
            # lin heads alone leave the AlexNet trunk at RANDOM init:
            # p_loss numbers would be meaningless yet land in the result
            # files looking real (training refuses outright; eval warns
            # loudly since the other metrics remain valid)
            print(
                "WARNING: p_loss will use a RANDOM LPIPS backbone — pass "
                "--lpips_backbone (converted torchvision weights) for real "
                "perceptual scores",
                file=sys.stderr,
            )
        lpips_pair = (LPIPS(net="alex"), load_lpips_params(lin, backbone))

    metrics = tuple(args.metrics)
    if "p_loss" in metrics and lpips_pair is None:
        print("warning: dropping p_loss (no --lpips_lin provided)")
        metrics = tuple(m for m in metrics if m != "p_loss")

    datafiles, data_root = read_datafiles(args.data_dir, args.datasets, args.loader_type)
    if not datafiles:
        print(f"no datafiles found under {args.data_dir}")
        return 1
    checkpoints = read_checkpoints(args.weights_dir, args.st, args.ed)
    if not checkpoints:
        print(f"no checkpoints found under {args.weights_dir}")
        return 1

    out_dir = args.output_dir or args.weights_dir
    for ckpt in checkpoints:
        name = os.path.split(ckpt)[-1].split(".")[0]
        if args.pause_st is not None:
            result_file = f"{name}_{args.datatype}_{args.pause_st}_{args.pause_ed}.txt"
            subseq = None
        elif args.subseq_L:
            result_file = f"{name}_L{args.subseq_L}_{args.datatype}.txt"
            subseq = args.subseq_L
        else:
            result_file = f"{name}_{args.datatype}.txt"
            subseq = None
        result_file = os.path.join(out_dir, result_file)
        if os.path.exists(result_file):
            print(f"skipping {ckpt} (result exists)")
            continue
        print(f"loading {ckpt} ...")
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        if ckpt.endswith(".msgpack"):
            from bde2vid_tpu.train import load_checkpoint

            spec = load_checkpoint(ckpt, dtype=dtype)
        else:
            spec = load_model_from_torch(ckpt, dtype=dtype)
        if spec.name == "BDE2VID":
            # ALWAYS apply the resolved flag — not only to enable:
            # a checkpoint trained with use_pallas_attention baked into its
            # sidecar config must honor --no-pallas (and the auto-off on
            # non-TPU hosts, where the kernels would crawl in interpret
            # mode), so disabling matters as much as enabling
            from bde2vid_tpu.models.api import set_pallas_attention

            spec = set_pallas_attention(
                spec, resolve_pallas(args.pallas, spec.name), dtype=dtype
            )
        print(f"{spec.name}: {spec.num_params / 1e6:.2f}M parameters")
        cfg = EvalConfig(
            ltype=args.loader_type,
            num_bins=spec.num_bins,
            combined_voxel_channels=not args.separate_polarity,
            subseq_L=subseq,
            max_length=args.max_length,
            pause_st=args.pause_st,
            pause_ed=args.pause_ed,
            filter_hot_events=args.filter_hot_events,
            normalize=args.normalize or getattr(spec, "normalize", False),
            eq=args.eq,
            metrics=metrics,
            lpips=lpips_pair,
            # keyed on the LOADED model type, not the checkpoint filename:
            # a lowercase 'evsnn_e10.pth' must still get the reference's
            # robust 1/99-percentile output normalization
            # (rec_snn_forward.py applies it to membrane potentials)
            robust_norm_output=spec.name in ("EVSNN", "PAEVSNN") or "SNN" in name,
            save_images_to=args.saveim,
            show=args.show,
            wait_time=args.wait_time,
            shard_data=args.shard_data,
        )
        evaluate_all(spec, datafiles, data_root, result_file, cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
