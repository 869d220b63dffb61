"""Steady-state training throughput on one chip.

Times the jitted train step (forward+backward+Adam) after compilation,
device-synced, for two documented configs:

  e2vid    — E2VIDRecurrent at the reference eval config (4-level UNet,
             base 32, ConvLSTM), the classic e2vid training regime
  bde2vid  — mid-size BDE2VID (depths [2,2], base 16, buffer ±1): the
             flagship family with attention ON at a trainable scale

plus the host-side window-assembly cost of the train CLI's data iterator
(which the CLI overlaps with device compute via async dispatch).

Run:  python tools/profile_train.py [--which e2vid|bde2vid|both]
      [--T 8] [--hw 112 160] [--steps 20]
One JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "e2vid": (
        "E2VIDRecurrent",
        {"num_bins": 5, "num_encoders": 3, "base_num_channels": 32,
         "num_residual_blocks": 2, "recurrent_block_type": "convlstm"},
        False,
    ),
    "bde2vid": (
        "BDE2VID",
        {"generator": {"num_bins": 5, "basechannels": 16, "num_encoders": 3,
                       "ks": 5, "num_res_blocks": 2,
                       "buffer_index": [-1, 0, 1], "depths": [2, 2],
                       "num_heads": 8, "window_size": [7, 7]}},
        True,
    ),
    # the TRUE flagship (reference V5 defaults: base 32, buffer +-3, depths
    # [4,0,6], 16 heads — bde2vid_cross_scale_propogation_V5.py:19-23); run
    # with --hw 184 240 for the native sensor scale
    "flagship": (
        "BDE2VID",
        {"generator": {"num_bins": 5, "basechannels": 32, "num_encoders": 3,
                       "ks": 5, "num_res_blocks": 2,
                       "buffer_index": [-3, -2, -1, 0, 1, 2, 3],
                       "depths": [4, 0, 6], "num_heads": 16,
                       "window_size": [7, 7]}},
        True,
    ),
}


def _lpips_rand_params(h: int, w: int):
    """Random-init LPIPS(alex) params, for TIMING the PerceptualLoss path
    when no converted backbone exists in the image (the loss VALUES are
    meaningless; the compute graph — 5-slice alexnet features on pred and
    gt + lin heads, fwd AND bwd — is exactly the production one)."""
    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.metrics.lpips import LPIPS

    module = LPIPS(net="alex")
    x = jnp.zeros((1, h, w, 3))
    return module.init(jax.random.PRNGKey(0), x, x)


def profile_one(
    key: str,
    T: int,
    hw,
    steps: int,
    remat: bool = False,
    bf16: bool = False,
    pallas: bool = False,
    f32_fast: bool = False,
    losses: str = "l1",
    loss_inds=None,
    batch: int = 1,
) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.train import SequenceLossComputer, make_train_step

    name, cfg, is_seq = CONFIGS[key]
    if name == "BDE2VID" and (pallas or remat or f32_fast):
        # remat goes to the MODEL (per-step nn.remat inside the scans) — the
        # trainer-level jax.checkpoint cannot reduce the backward peak
        cfg = {"generator": dict(cfg["generator"],
                                 use_pallas_attention=pallas, remat=remat,
                                 pallas_f32_exact=not f32_fast)}
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = build_model(name, cfg, train=True, dtype=dtype)
    h, w = hw
    rng = np.random.default_rng(0)
    voxels = jnp.asarray(rng.normal(size=(T, batch, h, w, 5)).astype(np.float32))
    gts = jnp.asarray(rng.uniform(size=(T, batch, h, w, 1)).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)}
    if is_seq:
        params = model.init(rngs, voxels[:2])
    else:
        params = model.init(rngs, voxels[0], model.initial_state(batch, h, w))
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    losses_cfg = [{"type": "L1Loss"}]
    lpips_params = None
    if losses == "ref":
        # the reference training surface (V5:210-241): L1 + PerceptualLoss,
        # gated by loss_inds. Backbone weights are unavailable in this image
        # (torchvision absent) so the LPIPS params are RANDOM — timing-only.
        losses_cfg = [{"type": "L1Loss"}, {"type": "PerceptualLoss"}]
        lpips_params = _lpips_rand_params(h, w)
    step = make_train_step(model, tx, SequenceLossComputer(losses_cfg, loss_inds),
                           lpips_params=lpips_params,
                           is_sequence_model=is_seq, donate=False,
                           remat=remat and name != "BDE2VID")

    # SYNC VIA VALUE READBACK, not block_until_ready: on the axon backend
    # block_until_ready returns early while the plugin's deferred
    # first-execution compile is pending (measured r3: a block-only-warmed
    # train loop reported 0.3 ms/step where the true number is ~16 ms).
    # A float() readback is the only reliable barrier.
    key_ = jax.random.PRNGKey(2)
    t0 = time.monotonic()
    params, opt_state, loss = step(params, opt_state, key_, voxels, gts, None)
    l0 = float(loss["loss"])
    t_compile = time.monotonic() - t0

    t0 = time.monotonic()
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, key_, voxels, gts, None)
    l_last = float(loss["loss"])
    dt = time.monotonic() - t0
    return {
        "config": key, "T": T, "hw": list(hw), "batch": batch,
        "dtype": "bf16" if bf16 else "f32",
        "attention": "pallas" if pallas else "xla",
        "f32_fast": f32_fast,
        "losses": losses, "loss_inds": loss_inds, "remat": remat,
        "steps_per_s": round(steps / dt, 3),
        "frames_per_s": round(steps * T * batch / dt, 1),
        "ms_per_step": round(1e3 * dt / steps, 1),
        "compile_s": round(t_compile, 1),
        "loss_finite": bool(np.isfinite(l_last)) and bool(np.isfinite(l0)),
        # same window every step -> Adam must drive the loss down; a
        # decrease here is on-chip evidence the backward actually works
        "loss_first": round(l0, 5),
        "loss_last": round(l_last, 5),
        "loss_decreased": bool(l_last < l0),
    }


def profile_data(T: int, hw, n_windows: int = 20) -> dict:
    """Host window-assembly rate of the train CLI's iterator on a synthetic
    240x180 h5 (10k events/frame)."""
    import tempfile

    from bde2vid_tpu.events import H5EventWriter
    from bde2vid_tpu.train.__main__ import iterate_training_windows

    tmp = tempfile.mkdtemp(prefix="profile_train_")
    rng = np.random.default_rng(0)
    path = os.path.join(tmp, "seq.h5")
    wtr = H5EventWriter(path, sensor_size=(180, 240))
    t = 0.0
    for _ in range(40):
        n = 10000
        ts = np.sort(rng.uniform(t, t + 0.04, n))
        wtr.append_events(rng.integers(0, 240, n), rng.integers(0, 180, n),
                          ts, rng.integers(0, 2, n) > 0)
        wtr.add_image(rng.integers(0, 255, (180, 240)).astype(np.uint8),
                      float(ts[-1]))
        t += 0.04
    wtr.finalize()
    wtr.f.close()

    it = iterate_training_windows(tmp, T, 5, {}, multiple=8, crop_size=hw)
    np.asarray(next(it)[0])  # open + first voxelize compile (readback sync)
    t0 = time.monotonic()
    for _ in range(n_windows):
        v, _f, _ = next(it)
    np.asarray(v)  # force the async device window assembly to completion
    dt = time.monotonic() - t0
    return {
        "config": "data_iterator", "T": T, "hw": list(hw),
        "windows_per_s": round(n_windows / dt, 2),
        "ms_per_window": round(1e3 * dt / n_windows, 1),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="both",
                    choices=["e2vid", "bde2vid", "flagship", "both", "data"])
    ap.add_argument("--T", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(112, 160))
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint around the forward (the TPU analog "
                         "of the reference's use_checkpoint + cpu_cache)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="fused Pallas attention (custom-vjp backward)")
    ap.add_argument("--f32_fast", action="store_true",
                    help="f32 kernel dots at default (single-pass MXU) "
                         "precision instead of HIGHEST — the f32 training "
                         "throughput mode (pallas_f32_exact=False)")
    ap.add_argument("--losses", default="l1", choices=["l1", "ref"],
                    help="'ref' = L1 + PerceptualLoss (random LPIPS params; "
                         "timing-only — no converted backbone in this image)")
    ap.add_argument("--loss_inds", type=int, default=None,
                    help="reference loss subsampling: steps {0,n,2n,...} "
                         "within the first 40 (V5:40-43)")
    args = ap.parse_args(argv)

    keys = ["e2vid", "bde2vid"] if args.which == "both" else [args.which]
    for k in keys:
        if k == "data":
            continue
        print(json.dumps(profile_one(
            k, args.T, tuple(args.hw), args.steps,
            remat=args.remat, bf16=args.bf16, pallas=args.pallas,
            f32_fast=args.f32_fast,
            losses=args.losses, loss_inds=args.loss_inds, batch=args.batch,
        )), flush=True)
    if args.which in ("both", "data"):
        print(json.dumps(profile_data(args.T, tuple(args.hw))), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
