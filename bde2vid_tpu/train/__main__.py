"""Training CLI.

    python -m bde2vid_tpu.train --config config.json [--data_dir D] [--steps N]

The reference ships no training loop — only the config surface
(parse_config.py) and the in-model loss plumbing (V5:210-241). This driver
completes the path: json config -> model + losses + optimizer -> training
windows sampled from h5 sequences (with the reference's pause/noise
augmentation semantics) -> jitted train step (optionally data-parallel over
the device mesh) -> msgpack checkpoints.

Config schema (see utils/config.py):
{
  "name": "bde2vid_run",
  "model": {"type": "BDE2VID", "args": {...model config...}},
  "losses": [{"type": "L1Loss"}, ...],
  "loss_inds": null,
  "optimizer": {"lr": 1e-4},
  "data": {"sequence_length": 8, "num_bins": 5,
           "proba_pause_when_running": 0.05, "proba_pause_when_paused": 0.9,
           "noise_std": 0.1, "noise_fraction": 0.05},
  "train": {"steps": 1000, "ckpt_every": 200, "remat": false, "bf16": false}
}
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
def _window_device_fn(ch: int, cw: int):
    """Jitted on-device window finisher: item-select (pause repeats), zero
    paused steps, NHWC transpose, crop. Keeping this on device matters on
    a remote-TPU host: the old numpy path read the full-sensor voxels back
    to the host and re-uploaded the crop every window — two ~7 MB tunnel
    transfers per window that dominated data assembly (measured r3,
    tools/profile_train.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def f(vox, idx, paused, y0, x0):
        v = vox[idx]  # (L, B, H, W)
        v = jnp.where(paused[:, None, None, None], 0.0, v)
        v = jnp.transpose(v, (0, 2, 3, 1))  # (L, H, W, B)
        return lax.dynamic_slice(
            v, (0, y0, x0, 0), (v.shape[0], ch, cw, v.shape[3])
        )

    return f


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
    want_flows=False,
):
    import jax.numpy as jnp

    from bde2vid_tpu.data.transforms import sample_pause_mask

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
        # voxels stay ON DEVICE end to end (select/zero/transpose/crop in
        # one jitted program); only the small uint8 frames cross the tunnel
        vox = _window_device_fn(int(ch), int(cw))(
            vox,
            jnp.asarray(idx, jnp.int32),
            jnp.asarray(paused),
            jnp.int32(y0),
            jnp.int32(x0),
        )
        frames = frames[:, y0 : y0 + ch, x0 : x0 + cw]
        if want_flows:
            # pause semantics for flow: repeated (paused) steps see a static
            # scene, so their gt-to-gt displacement is ZERO; running steps
            # keep their window's flow, item-selected like the frames
            flows = flows[idx]
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
    crop_size=None, want_flows=False,
):
    """Yield (voxels (L,N,H,W,B), frames (L,N,H,W,1), flows (L,N,H,W,2)
    or None) batches of independent windows from all h5 sequences under
    data_dir, with Markov pause augmentation (zeroed events + repeated
    frame, zeroed flow — reference SequenceDataset, h5_dataset.py:668-756).
    Windows are cropped to ``crop_size`` (or the full sensor) rounded down
    to ``multiple``; flows are read only when ``want_flows``
    (TemporalConsistencyLoss)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
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
    while True:
        vs, fs, fls = zip(
            *(
                _one_window(
                    files, rng, seq_len, num_bins, pause_cfg, 1, crop_hw,
                    want_flows,
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
    import optax

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
    if crop_size is not None:
        crop_size = (
            (int(crop_size), int(crop_size))
            if np.isscalar(crop_size)
            else (int(crop_size[0]), int(crop_size[1]))
        )

    losses_cfg = cfg.get("losses", [{"type": "L1Loss"}])
    # TemporalConsistencyLoss consumes per-step gt displacement flows —
    # read them from the h5 files (SequenceData.flows) only when configured
    want_flows = any(c["type"] == "TemporalConsistencyLoss" for c in losses_cfg)

    it = iterate_training_windows(
        args.data_dir,
        seq_len,
        num_bins,
        data_cfg,
        batch=args.batch,
        multiple=2**num_encoders,
        crop_size=crop_size,
        want_flows=want_flows,
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

    tx = optax.adam(float(cfg.get("optimizer", {}).get("lr", 1e-4)))
    start_step, resume_key = 0, None
    if args.resume and is_train_state(args.resume):
        # full train-state checkpoint: params + Adam moments + step + PRNG
        # key restore, so the resumed run continues the original exactly
        spec, opt_state, start_step, resume_key = restore_train_state_orbax(
            args.resume, tx
        )
        params = spec.params
        print(f"exact resume from {args.resume} at step {start_step}")
    elif args.resume:
        spec = load_checkpoint(args.resume)
        params = spec.params
        opt_state = tx.init(params)
    else:
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
    key = resume_key if resume_key is not None else jax.random.PRNGKey(42)
    t0 = time.perf_counter()
    for i in range(start_step, steps):
        if i > start_step:  # the first step trains on the batch fetched for init —
            # at the loop top (not bottom) avoids assembling one full
            # unused batch after the final step
            voxels, gts, flows = next(it)
        key, k1, k2 = jax.random.split(key, 3)
        if noise_fn is not None:
            voxels = noise_fn(voxels, k2)
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
