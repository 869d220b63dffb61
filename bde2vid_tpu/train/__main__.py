"""Training CLI.

    python -m bde2vid_tpu.train --config config.json [--data_dir D] [--steps N]

The reference ships no training loop — only the config surface
(parse_config.py) and the in-model loss plumbing (V5:210-241). This driver
completes the path: json config -> model + losses + optimizer -> training
windows sampled from h5 sequences (with the reference's pause/noise
augmentation semantics) -> jitted train step (optionally data-parallel over
the device mesh) -> msgpack checkpoints.

Config schema (see utils/config.py; optimizer/lr_scheduler mirror the
reference's documented pytorch-template surface, parse_config.py:84-112 —
torch names, reflection-style {"type", "args"} sections; train/optim.py):
{
  "name": "bde2vid_run",
  "model": {"type": "BDE2VID", "args": {...model config...}},
  "losses": [{"type": "L1Loss"}, ...],
  "loss_inds": null,
  "optimizer": {"type": "Adam"|"AdamW"|"SGD"|"RMSprop",
                "args": {"lr": 1e-4, "weight_decay": 0.0, "grad_clip": 1.0,
                         ...torch args (betas/eps/momentum/nesterov/...)}},
    # back-compat: a flat {"lr": 1e-4} still means Adam(lr)
  "lr_scheduler": {"type": "StepLR"|"MultiStepLR"|"ExponentialLR"|
                           "CosineAnnealingLR"|"LinearLR",
                   "args": {...torch args, boundaries in train STEPS...}},
  "data": {"sequence_length": 8, "num_bins": 5, "crop_size": 112,
           "proba_pause_when_running": 0.05, "proba_pause_when_paused": 0.9,
           "noise_std": 0.1, "noise_fraction": 0.05,
           "hot_pixel_std": 2.0, "max_hot_pixel_fraction": 0.001,
           "transforms": {"RandomRotationFlip":
                              {"degrees": 20, "p_hflip": 0.5, "p_vflip": 0.5},
                          "RandomCrop": {"size": 112}}},
    # hot pixels/rotation-flip follow the reference training protocol
    # (utils_func/data_augmentation.py:48-59,126-180; SequenceDataset
    # hot_pixel_kwargs + per-item transforms, h5_dataset.py:668-756):
    # one rotation/flip + one hot-pixel pattern per window, shared by every
    # step; flows get the inverse-matrix channel mix
  "train": {"steps": 1000, "ckpt_every": 200, "remat": false, "bf16": false}
}

Data order is deterministic and resume-exact: the window sampler seeds a
fresh numpy Generator per STEP INDEX (``default_rng([seed, step])``), so a
run resumed from an exact-resume .state checkpoint at step k sees the same
batches steps k..N as the uninterrupted run — the stream is part of the
resumed state by construction, with no iterator fast-forward cost.

Validation: ``--val_dir D --val_every N`` scores MSE/SSIM on deterministic
held-out windows every N steps (eval-mode model, jitted metric program),
appends ``val_log.jsonl`` in the run dir, and keeps the best-MSE params as
``best.msgpack``.
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
import sys
import time

import numpy as np


_SEQ_CACHE: "OrderedDict" = None  # type: ignore[assignment]
_SEQ_CACHE_MAX = 64  # bound open h5 handles well under typical fd limits


def _open_sequence(path, num_bins):
    """Keep sequences open across windows (a fresh load_sequence per batch
    element per step re-opens + re-parses the h5 on the single host core,
    serializing data assembly with the device step), with LRU eviction so
    open h5 handles stay bounded on large datasets (r3 review)."""
    global _SEQ_CACHE
    from collections import OrderedDict

    if _SEQ_CACHE is None:
        _SEQ_CACHE = OrderedDict()
    key = (path, num_bins)
    if key in _SEQ_CACHE:
        _SEQ_CACHE.move_to_end(key)
        return _SEQ_CACHE[key]
    from bde2vid_tpu.data import load_sequence

    seq = load_sequence(path, num_bins=num_bins)
    _SEQ_CACHE[key] = seq
    while len(_SEQ_CACHE) > _SEQ_CACHE_MAX:
        _, old = _SEQ_CACHE.popitem(last=False)
        old.reader.close()
    return seq


@functools.lru_cache(maxsize=None)
def _window_device_fn(ch: int, cw: int, rot: bool = False):
    """Jitted on-device window finisher: item-select (pause repeats), zero
    paused steps, optional full-sensor affine rotation/flip, NHWC
    transpose, crop. Keeping this on device matters on a remote-TPU host:
    the old numpy path read the full-sensor voxels back to the host and
    re-uploaded the crop every window — two ~7 MB tunnel transfers per
    window that dominated data assembly (measured r3,
    tools/profile_train.py). With ``rot`` the fn takes the forward 2x3
    affine matrix and resamples BEFORE the crop — the reference's per-item
    transform order (rotate full sensor, then RandomCrop; the grid is
    built on device from the 24-byte matrix, not uploaded)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def _finish(v, y0, x0):
        v = jnp.transpose(v, (0, 2, 3, 1))  # (L, H, W, B)
        return lax.dynamic_slice(
            v, (0, y0, x0, 0), (v.shape[0], ch, cw, v.shape[3])
        )

    if not rot:

        @jax.jit
        def f(vox, idx, paused, y0, x0):
            v = vox[idx]  # (L, B, H, W)
            v = jnp.where(paused[:, None, None, None], 0.0, v)
            return _finish(v, y0, x0)

        return f

    from bde2vid_tpu.nn.sampling import grid_sample_bilinear

    @jax.jit
    def f_rot(vox, idx, paused, y0, x0, fwd):
        v = vox[idx]
        v = jnp.where(paused[:, None, None, None], 0.0, v)
        L, B, H, W = v.shape
        # F.affine_grid(align_corners=False) base coords: pixel centers —
        # identical math to data/transforms.RandomRotationFlip (host twin)
        gx = (2.0 * jnp.arange(W) + 1.0) / W - 1.0
        gy = (2.0 * jnp.arange(H) + 1.0) / H - 1.0
        X, Y = jnp.meshgrid(gx, gy)
        pts = jnp.stack([X, Y, jnp.ones_like(X)], axis=-1)  # (H, W, 3)
        grid = pts @ fwd.T  # (H, W, 2) output -> input coords
        img = v.reshape(L * B, H, W)[..., None]
        grid = jnp.broadcast_to(grid, (L * B, H, W, 2))
        v = grid_sample_bilinear(img, grid)[..., 0].reshape(L, B, H, W)
        return _finish(v, y0, x0)

    return f_rot


def _crop_shape(sensor_hw, crop_size, multiple):
    """Final (ch, cw) crop for a sensor: requested size clipped to the
    sensor and rounded down to ``multiple`` (the decoder-pyramid
    divisibility requirement)."""
    h, w = sensor_hw
    ch, cw = crop_size if crop_size else (h, w)
    ch = min(int(ch), h) // multiple * multiple
    cw = min(int(cw), w) // multiple * multiple
    if ch == 0 or cw == 0:
        raise ValueError(
            f"sensor {h}x{w} too small to crop to a multiple of {multiple}"
        )
    return ch, cw


def _one_window(
    files, rng, seq_len, num_bins, pause_cfg, multiple=1, crop_size=None,
    want_flows=False, rot_cfg=None,
):
    import jax.numpy as jnp

    from bde2vid_tpu.data.transforms import RandomRotationFlip, sample_pause_mask

    rotflip = None
    if rot_cfg:
        # ONE rotation/flip per window, shared by every step (the
        # reference's shared per-sequence transform seed,
        # h5_dataset.py:708-712); voxels resample on device inside the
        # window finisher, frames/flows on host below
        rotflip = RandomRotationFlip(**rot_cfg)
        rotflip.sample_params(rng)

    # random draws first; if unlucky, fall back to an exhaustive scan over
    # all files before giving up (a purely random bound would spuriously
    # abort a long run whose valid files are rare — r3 review). The
    # fallback order is rng-SHUFFLED, not list order: a fixed order would
    # bias the rare-valid-file regime toward the first long file on disk.
    candidates = [files[int(rng.integers(len(files)))] for _ in range(20)]
    candidates += [files[int(i)] for i in rng.permutation(len(files))]
    for path in candidates:
        seq = _open_sequence(path, num_bins)
        if len(seq) < seq_len:
            continue
        # high is inclusive of the LAST valid start (len - seq_len): the
        # window only reads items [start, start+seq_len), so files of
        # exactly seq_len items are trainable and each file's final item
        # stays in the training distribution
        start = int(rng.integers(0, len(seq) - seq_len + 1))
        flows = None
        if want_flows:
            flows = seq.flows(start, start + seq_len)  # (L, H, W, 2) or None
            if flows is None:
                continue  # file carries no flow — try another
        idx, paused = sample_pause_mask(
            seq_len,
            rng,
            pause_cfg.get("proba_pause_when_running", 0.0),
            pause_cfg.get("proba_pause_when_paused", 0.0),
        )
        vox = seq.voxels(start, start + seq_len)  # device (L, B, H, W)
        # stored uint8 frames when the backend allows (4x less host->device
        # traffic; scaled to [0,1] on device in iterate_training_windows)
        frames = (
            seq.frames_u8(start, start + seq_len)
            if hasattr(seq, "frames_u8")
            else None
        )
        if frames is None:
            frames = seq.frames(start, start + seq_len)  # host (L, H, W) f32
        frames = frames[idx]
        # spatial crop: the decoders upsample x2 per level, so H/W must be
        # multiples of 2^num_encoders (the eval driver pads via
        # CropParameters; training crops instead — synthetic zero borders
        # would teach the model to paint black margins). Random offset per
        # window = the reference's RandomCrop training protocol
        # (utils_func/data_augmentation.py:127-180).
        h, w = int(vox.shape[2]), int(vox.shape[3])
        ch, cw = _crop_shape((h, w), crop_size, multiple)
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - cw + 1))
        # voxels stay ON DEVICE end to end (select/zero/[rotate]/transpose/
        # crop in one jitted program); only the small frames cross the tunnel
        dev_args = [
            vox,
            jnp.asarray(idx, jnp.int32),
            jnp.asarray(paused),
            jnp.int32(y0),
            jnp.int32(x0),
        ]
        if rotflip is not None:
            dev_args.append(jnp.asarray(rotflip._fwd))
        vox = _window_device_fn(int(ch), int(cw), rotflip is not None)(*dev_args)
        if rotflip is not None:
            # frames rotate on host with the identical sampler math
            # (data/transforms twin of the device path); bilinear needs
            # float, so rotation-enabled runs forgo the uint8 upload path
            if frames.dtype == np.uint8:
                frames = frames.astype(np.float32) / 255.0
            frames = rotflip(frames)  # (L, H, W) as channels
        frames = frames[:, y0 : y0 + ch, x0 : x0 + cw]
        if want_flows:
            # pause semantics for flow: repeated (paused) steps see a static
            # scene, so their gt-to-gt displacement is ZERO; running steps
            # keep their window's flow, item-selected like the frames
            flows = flows[idx]
            if rotflip is not None:
                # flow fields additionally mix channels by the inverse
                # matrix (reference :226-240)
                flows = np.stack(
                    [
                        rotflip(f.transpose(2, 0, 1), is_flow=True).transpose(1, 2, 0)
                        for f in flows
                    ]
                )
            flows[np.asarray(paused)] = 0.0
            flows = flows[:, y0 : y0 + ch, x0 : x0 + cw]
            return vox, frames[..., None], flows
        return vox, frames[..., None], None
    need = f">= {seq_len} items" + (" with flow data" if want_flows else "")
    raise ValueError(
        f"no h5 sequence under {len(files)} files has {need} — shorten "
        "sequence_length or add data"
    )


def iterate_training_windows(
    data_dir, seq_len, num_bins, pause_cfg, batch=1, seed=0, multiple=1,
    crop_size=None, want_flows=False, rot_cfg=None, start_step=0,
):
    """Yield (voxels (L,N,H,W,B), frames (L,N,H,W,1), flows (L,N,H,W,2)
    or None) batches of independent windows from all h5 sequences under
    data_dir, with Markov pause augmentation (zeroed events + repeated
    frame, zeroed flow — reference SequenceDataset, h5_dataset.py:668-756)
    and optional per-window rotation/flip (``rot_cfg`` =
    RandomRotationFlip kwargs).

    Windows are cropped to ``crop_size`` (or the full sensor) rounded down
    to ``multiple``; flows are read only when ``want_flows``
    (TemporalConsistencyLoss).

    The batch for step k is a pure function of ``(seed, k)``: every step
    seeds a FRESH Generator ``default_rng([seed, step])``, so an exact
    resume at ``start_step=k`` reproduces the uninterrupted run's data
    stream from step k with zero fast-forward cost (a single sequential
    stream would silently re-train steps 0..N-k after resume)."""
    import jax.numpy as jnp

    files = sorted(glob.glob(os.path.join(data_dir, "**", "*.h5"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no h5 sequences under {data_dir}")
    # ONE run-wide crop shape, derived from the minimum sensor dims across
    # all files (one-time open of each, LRU-bounded): per-file crops would
    # shape-mismatch inside a batch when a dataset mixes sensor resolutions
    # and would recompile the train step across batches even at batch=1
    sensors = [_open_sequence(p, num_bins).sensor_size for p in files]
    min_hw = (min(s[0] for s in sensors), min(s[1] for s in sensors))
    crop_hw = _crop_shape(min_hw, crop_size, multiple)
    step = int(start_step)
    while True:
        rng = np.random.default_rng([int(seed), step])
        step += 1
        vs, fs, fls = zip(
            *(
                _one_window(
                    files, rng, seq_len, num_bins, pause_cfg, 1, crop_hw,
                    want_flows, rot_cfg,
                )
                for _ in range(batch)
            )
        )
        # voxels are device arrays (stack stays on device); frames upload
        # once per batch (uint8 when stored so, scaled on device — the
        # train step's [0,1] float contract is preserved). A batch mixing
        # uint8- and float-stored files must normalize BEFORE stacking:
        # np.stack would promote to float32 and the device-side /255 would
        # silently skip, training against 0-255 ground truth.
        if len({f.dtype for f in fs}) > 1:
            fs = tuple(
                f.astype(np.float32) / 255.0 if f.dtype == np.uint8 else f
                for f in fs
            )
        fr = np.stack(fs, axis=1)
        fr_dev = jnp.asarray(fr)
        if fr.dtype == np.uint8:
            fr_dev = fr_dev.astype(jnp.float32) / 255.0
        fl_dev = jnp.asarray(np.stack(fls, axis=1)) if want_flows else None
        yield jnp.stack(vs, axis=1), fr_dev, fl_dev


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="train reconstruction models")
    p.add_argument("--config", required=True)
    p.add_argument("--data_dir", default="data/train")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--resume", default=None,
                   help="checkpoint to resume: a .msgpack (params only, "
                   "fresh optimizer) or a .state dir (exact resume: params "
                   "+ Adam moments + step + PRNG key)")
    p.add_argument("--save_state", action="store_true",
                   help="also write epoch_N.state full train-state "
                   "checkpoints (orbax) at every checkpoint interval")
    p.add_argument("--batch", type=int, default=1,
                   help="independent windows per step; sharded over the "
                        "device mesh 'data' axis when divisible")
    p.add_argument("--lpips_lin", default=None,
                   help="LPIPS lin-head .pth for PerceptualLoss/VIPLoss "
                        "(auto-discovered when omitted)")
    p.add_argument("--lpips_backbone", default=None,
                   help="converted LPIPS backbone weights (.pth/.npz)")
    p.add_argument("--val_dir", default=None,
                   help="held-out h5 directory: score MSE/SSIM on fixed "
                        "windows every --val_every steps, append "
                        "val_log.jsonl, keep best-MSE params as best.msgpack")
    p.add_argument("--val_every", type=int, default=0,
                   help="validation interval in steps (0 disables)")
    p.add_argument("--val_windows", type=int, default=4,
                   help="number of held-out windows scored per validation")
    p.add_argument("--prefetch", type=int, default=0,
                   help="windows staged ahead by a background assembly "
                        "thread (0 disables — the right default here: on "
                        "the single-core host + remote-TPU tunnel a "
                        "second thread's RPCs contend with the train-step "
                        "dispatches, measured 18x SLOWER; useful only on "
                        "multi-core hosts with local devices)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from bde2vid_tpu.data.transforms import add_noise_to_voxel
    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.train import (
        SequenceLossComputer,
        is_train_state,
        load_checkpoint,
        make_train_step,
        restore_train_state_orbax,
        save_checkpoint,
        save_train_state_orbax,
    )
    from bde2vid_tpu.utils.config import Config

    cfg = Config.from_json(args.config, make_run_dir=args.out_dir is None)
    out_dir = args.out_dir or cfg.run_dir
    os.makedirs(out_dir, exist_ok=True)

    model_cfg = dict(cfg["model"].get("args", {}))
    model_name = cfg["model"]["type"]
    remat = bool(cfg.get("train", {}).get("remat", False))
    if remat and model_name == "BDE2VID":
        # sequence models remat PER SCAN STEP inside the model (the
        # trainer-level jax.checkpoint cannot reduce the backward peak)
        model_cfg["remat"] = True
    # "train": {"bf16": true} = the measured throughput mode (bf16 compute,
    # f32 params/optimizer; pair with model args use_pallas_attention for
    # the Pallas fwd+bwd kernels — flagship 321 -> 167 ms/step, BENCHMARKS)
    bf16 = bool(cfg.get("train", {}).get("bf16", False))
    model = build_model(
        model_name, model_cfg, train=True,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    is_seq = bool(getattr(model, "is_sequence_model", False))

    data_cfg = cfg.get("data", {})
    seq_len = int(data_cfg.get("sequence_length", 8))
    num_bins = int(data_cfg.get("num_bins", 5))
    noise_std = float(data_cfg.get("noise_std", 0.0))
    noise_fraction = float(data_cfg.get("noise_fraction", 0.0))
    # H/W divisibility requirement of the model's decoder pyramid
    num_encoders = int(model_cfg.get("num_encoders", 3))
    crop_size = data_cfg.get("crop_size")
    # reference-shaped per-item transform config (h5_dataset.py:721-747):
    # RandomCrop maps onto the window sampler's crop; RandomRotationFlip
    # becomes the per-window affine resample
    transforms_cfg = dict(data_cfg.get("transforms", {}))
    rot_cfg = transforms_cfg.pop("RandomRotationFlip", None)
    rc = transforms_cfg.pop("RandomCrop", None)
    if rc is not None and crop_size is None:
        crop_size = rc["size"]
    if transforms_cfg:
        raise SystemExit(
            f"unknown data.transforms entries: {sorted(transforms_cfg)} "
            "(supported: RandomRotationFlip, RandomCrop)"
        )
    if crop_size is not None:
        crop_size = (
            (int(crop_size), int(crop_size))
            if np.isscalar(crop_size)
            else (int(crop_size[0]), int(crop_size[1]))
        )
    hot_std = float(data_cfg.get("hot_pixel_std", 1.0))
    hot_frac = float(data_cfg.get("max_hot_pixel_fraction", 0.0))

    losses_cfg = cfg.get("losses", [{"type": "L1Loss"}])
    # TemporalConsistencyLoss consumes per-step gt displacement flows —
    # read them from the h5 files (SequenceData.flows) only when configured
    want_flows = any(c["type"] == "TemporalConsistencyLoss" for c in losses_cfg)

    from bde2vid_tpu.train.optim import build_optimizer

    tx, tx_desc = build_optimizer(cfg.get("optimizer"), cfg.get("lr_scheduler"))
    print(f"optimizer: {tx_desc}")
    start_step, resume_key, params = 0, None, None
    if args.resume and is_train_state(args.resume):
        # full train-state checkpoint: params + optimizer state (moments
        # AND schedule position) + step + PRNG key restore, so the resumed
        # run continues the original exactly; the data stream follows via
        # per-step window seeding (iterate_training_windows start_step)
        spec, opt_state, start_step, resume_key = restore_train_state_orbax(
            args.resume, tx
        )
        params = spec.params
        print(f"exact resume from {args.resume} at step {start_step}")
    elif args.resume:
        spec = load_checkpoint(args.resume)
        params = spec.params
        opt_state = tx.init(params)

    it = iterate_training_windows(
        args.data_dir,
        seq_len,
        num_bins,
        data_cfg,
        batch=args.batch,
        multiple=2**num_encoders,
        crop_size=crop_size,
        want_flows=want_flows,
        rot_cfg=rot_cfg,
        start_step=start_step,
    )
    if args.prefetch > 0:
        # background thread assembles ahead: overlaps the window
        # assembly's synchronous device_put RPC waits with device compute
        # (the torch DataLoader-workers analog; single h5 reader thread)
        from bde2vid_tpu.data.prefetch import prefetch_to_device

        it = prefetch_to_device(it, size=args.prefetch)
    voxels, gts, flows = next(it)

    # data-parallel sharding when the batch divides a MULTI-device count
    # (on one device the DP path is pure overhead: a 1-device mesh plus
    # per-step device_puts through the tunnel for zero parallelism)
    shard = None
    if args.batch > 1 and jax.device_count() > 1 and args.batch % jax.device_count() == 0:
        from bde2vid_tpu.parallel.mesh import make_mesh, data_sharding

        mesh = make_mesh(jax.device_count(), 1)
        shard = data_sharding(mesh, 5, batch_axis=1)
        print(f"sharding batch {args.batch} over {jax.device_count()} devices")

    if params is None:
        rngs = {"params": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)}
        if is_seq:
            params = model.init(rngs, voxels)
        else:
            n, h, w = voxels.shape[1], voxels.shape[2], voxels.shape[3]
            params = model.init(rngs, voxels[0], model.initial_state(n, h, w))
        opt_state = tx.init(params)

    comp = SequenceLossComputer(losses_cfg, cfg.get("loss_inds"))

    # LPIPS-backed losses need feature-net params (reference PerceptualLoss/
    # VIPLoss build an LPIPS net, losses.py:15-162); without weights the
    # first step would die with an opaque flax scope error inside jit
    lpips_params = None
    lpips_names = {"PerceptualLoss", "VIPLoss"} & {c["type"] for c in losses_cfg}
    if lpips_names:
        from bde2vid_tpu.eval.checkpoint import _to_numpy_state, load_torch_file
        from bde2vid_tpu.metrics.lpips import find_default_lpips_lin, load_lpips_params

        lpips_lin = args.lpips_lin or find_default_lpips_lin()
        if not lpips_lin:
            raise SystemExit(
                f"losses {sorted(lpips_names)} need LPIPS weights: pass "
                "--lpips_lin (and --lpips_backbone)"
            )
        if not args.lpips_backbone:
            # unlike eval (where a missing backbone only degrades a
            # REPORTED metric), training against random backbone features
            # is a silently wrong loss — refuse
            raise SystemExit(
                f"losses {sorted(lpips_names)} need a REAL feature "
                "backbone: pass --lpips_backbone (converted torchvision "
                "weights); lin heads alone leave the alexnet at random init"
            )
        lin = _to_numpy_state(load_torch_file(lpips_lin))
        backbone = _to_numpy_state(load_torch_file(args.lpips_backbone))
        lpips_params = load_lpips_params(lin, backbone)
        print(f"lpips: lin {lpips_lin} backbone {args.lpips_backbone}")

    step_fn = make_train_step(
        model,
        tx,
        comp,
        lpips_params=lpips_params,
        is_sequence_model=is_seq,
        remat=remat and model_name != "BDE2VID",
    )

    steps = args.steps or int(cfg.get("train", {}).get("steps", 1000))
    ckpt_every = int(cfg.get("train", {}).get("ckpt_every", 200))
    # ONE jitted program for the noise augmentation: eager add_noise_to_voxel
    # issues ~5 separate device dispatches per step (~1-2 ms RPC each on the
    # tunneled backend) for work that is microseconds on chip
    noise_fn = (
        jax.jit(
            functools.partial(
                add_noise_to_voxel,
                noise_std=noise_std,
                noise_fraction=noise_fraction,
            )
        )
        if noise_std > 0
        else None
    )
    hot_fn = None
    if hot_frac > 0:
        # reference protocol: ONE hot-pixel pattern per sequence window,
        # added to every step's voxels (data_augmentation.py:48-59); batch
        # elements are independent windows, so each gets its own pattern
        from bde2vid_tpu.data.transforms import add_hot_pixels_to_sequence

        _hot_one = functools.partial(
            add_hot_pixels_to_sequence,
            hot_pixel_std=hot_std,
            max_hot_pixel_fraction=hot_frac,
        )
        hot_fn = jax.jit(
            lambda v, ks: jax.vmap(_hot_one, in_axes=(1, 0), out_axes=1)(v, ks)
        )

    validator = None
    if args.val_dir and args.val_every > 0:
        from bde2vid_tpu.train.validate import Validator

        validator = Validator(
            model_name, model_cfg, args.val_dir,
            seq_len=seq_len, num_bins=num_bins, windows=args.val_windows,
            multiple=2**num_encoders, crop_size=crop_size, bf16=bf16,
        )

    key = resume_key if resume_key is not None else jax.random.PRNGKey(42)
    t0 = time.perf_counter()
    for i in range(start_step, steps):
        if i > start_step:  # the first step trains on the batch fetched for init —
            # at the loop top (not bottom) avoids assembling one full
            # unused batch after the final step
            voxels, gts, flows = next(it)
        key, k1, k2, k3 = jax.random.split(key, 4)
        if noise_fn is not None:
            voxels = noise_fn(voxels, k2)
        if hot_fn is not None:
            voxels = hot_fn(voxels, jax.random.split(k3, voxels.shape[1]))
        if shard is not None:
            voxels = jax.device_put(voxels, shard)
            gts = jax.device_put(gts, shard)
            if flows is not None:
                flows = jax.device_put(flows, shard)
        params, opt_state, loss_dict = step_fn(
            params, opt_state, k1, voxels, gts, flows
        )
        if i % 20 == 0:
            loss = float(loss_dict["loss"])
            rate = (i + 1 - start_step) / (time.perf_counter() - t0)
            print(f"step {i}: loss={loss:.5f} ({rate:.2f} steps/s)", flush=True)
        if validator is not None and (
            (i + 1) % args.val_every == 0 or i + 1 == steps
        ):
            rec = validator.log_and_track(out_dir, i + 1, params)
            print(
                f"val step {i + 1}: mse={rec['mse']:.6f} "
                f"ssim={rec['ssim']:.4f}"
                + (" (new best)" if rec["best"] else ""),
                flush=True,
            )
        if (i + 1) % ckpt_every == 0 or i + 1 == steps:
            path = os.path.join(out_dir, f"epoch_{i + 1}.msgpack")
            save_checkpoint(path, params, model_name, model_cfg)
            print(f"saved {path}", flush=True)
            if args.save_state:
                spath = os.path.join(out_dir, f"epoch_{i + 1}.state")
                save_train_state_orbax(
                    spath, params, opt_state, i + 1, key, model_name, model_cfg
                )
                print(f"saved {spath}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
