"""Standalone SNN reconstruction CLI (reference model/EVSNN/rec_snn.py:19-102).

    python -m bde2vid_tpu.eval.rec_snn -network EVSNN \
        -path_to_pretrain_models EVSNN.pth -path_to_event_files events.txt \
        -save_path results -height 180 -width 240 -num_events_per_pixel 0.5

Reads a ``t x y pol`` text event stream in fixed-count chunks
(height*width*num_events_per_pixel events, skipping a 10-line header like
the reference), voxelizes each chunk to 5 bins, LegacyNorm-normalizes the
whole tensor once, feeds the bins one at a time through the spiking net
(membrane state persists across chunks), and saves one robust-normalized
PNG per bin.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("-network", type=str, default="EVSNN",
                        choices=["EVSNN", "PAEVSNN"])
    parser.add_argument("-path_to_pretrain_models", type=str, required=True)
    parser.add_argument("-path_to_event_files", type=str, required=True)
    parser.add_argument("-save_path", type=str, default="./results")
    parser.add_argument("-height", type=int, default=180)
    parser.add_argument("-width", type=int, default=240)
    parser.add_argument("-num_events_per_pixel", type=float, default=0.5)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.events.voxel import events_to_voxel, pad_events
    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.utils.norm import legacy_norm, robust_norm, to_uint8_image
    from bde2vid_tpu.utils.padding import CropParameters
    from bde2vid_tpu.utils.png import write_gray_png

    h, w = args.height, args.width
    num_bins = 5
    n_chunk = int(h * w * args.num_events_per_pixel)
    crop = CropParameters(w, h, 3)

    # load weights: framework msgpack or torch bare state dict
    if args.path_to_pretrain_models.endswith(".msgpack"):
        from bde2vid_tpu.train import load_checkpoint

        spec = load_checkpoint(args.path_to_pretrain_models)
        model, params = spec.module, spec.params
        model = build_model(args.network, dict(model.config or {}, normalize_input=False))
    else:
        from bde2vid_tpu.eval.checkpoint import load_model_from_torch

        # dispatch relies on 'SNN' in the filename (reference convention)
        spec = load_model_from_torch(args.path_to_pretrain_models)
        params = spec.params
        model = build_model(args.network, {"normalize_input": False})
    if spec.name != args.network:
        # a PAEVSNN param tree applied to an EVSNN module (or vice versa)
        # dies deep inside flax with a missing-param error — fail clearly
        raise SystemExit(
            f"checkpoint is a {spec.name} model but -network says "
            f"{args.network} — pass the matching network name"
        )

    savepath = os.path.join(args.save_path, args.network)
    os.makedirs(savepath, exist_ok=True)

    hp, wp = crop.height_crop_size, crop.width_crop_size
    state = model.initial_state(1, hp, wp)
    step = jax.jit(lambda v, s: model.apply(params, v, s))

    def chunks():
        buf = []
        with open(args.path_to_event_files) as fp:
            for _ in range(10):  # reference skiprows=10
                fp.readline()
            for line in fp:
                parts = line.split()
                if len(parts) != 4:
                    continue
                buf.append(parts)
                if len(buf) == n_chunk:
                    yield buf
                    buf = []

    i = 0
    for chunk in chunks():
        arr = np.asarray(chunk, np.float64)
        ts, xs, ys, ps = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
        ps = np.where(ps > 0, 1.0, -1.0).astype(np.float32)
        # rebase in float64 BEFORE the float32 cast (reference
        # EVSNN/utils/util.py:51-58 normalizes (t - first)/deltaT in
        # float64): epoch-scale stamps (~1.6e9 s) have ~128 s float32
        # resolution — a raw cast collapses a whole chunk to 1-2 distinct
        # values and garbles the temporal bins
        ts = ts - ts[0]
        px, py, pt, pp, n = pad_events(
            xs.astype(np.int32), ys.astype(np.int32), ts.astype(np.float32), ps
        )
        voxel = events_to_voxel(px, py, pt, pp, n, num_bins=num_bins, sensor_size=(h, w))
        voxel = jnp.transpose(voxel, (1, 2, 0))[None]  # (1, H, W, B)
        voxel = crop.pad(voxel)
        # whole-tensor norm (reference rec_snn :62-63; torch .std() on the
        # nonzero subset = unbiased estimator)
        voxel = legacy_norm(voxel, unbiased=True)
        for j in range(num_bins):
            out, state = step(voxel[..., j : j + 1], state)
            img = crop.crop(out["image"])[0, :, :, 0]
            img = robust_norm(img, 1, 99)
            write_gray_png(
                os.path.join(savepath, f"result-idx{i:04d}{j:04d}.png"),
                to_uint8_image(np.asarray(img)),
            )
        print(f"\rProcessing: {i * num_bins}.", end="", flush=True)
        i += 1
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
