"""Sequence evaluation driver.

Reference control flow (eval_models_seq.py:99-290) rebuilt TPU-native:

- the per-step Python loop over ``model({'events': ...})`` becomes one
  jitted ``lax.scan`` per subsequence chunk (run_sequence_chunked), with
  voxelization batched on device beforehand;
- metrics are computed batched over all steps on device (vmapped SSIM,
  one MSE reduction per step, LPIPS in mini-batches) instead of one host
  round-trip per step;
- the "pause" robustness experiment (:184-189) zeroes the voxels for steps
  in (pause_st, pause_ed] while repeating the last real frame;
- results keep the reference JSON schema so generate_table is drop-in.

Result semantics preserved: metric averaged as sum-over-steps / T; images
cropped back to sensor size before scoring; SNN outputs robust-normalized
(:246-248); optional histogram equalization (--eq).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bde2vid_tpu.data.pipeline import EventSequence, load_sequence
from bde2vid_tpu.metrics.basic import mse, psnr, structural_similarity
from bde2vid_tpu.metrics.lpips import LPIPS, lpips_distance
from bde2vid_tpu.models.api import ModelSpec, run_sequence
from bde2vid_tpu.utils.norm import robust_norm
from bde2vid_tpu.utils.padding import CropParameters


@dataclasses.dataclass
class EvalConfig:
    num_bins: int = 5
    ltype: str = "H5"
    combined_voxel_channels: bool = True
    subseq_L: Optional[int] = 1000
    max_length: Optional[int] = 111200
    pause_st: Optional[int] = None
    pause_ed: Optional[int] = None
    filter_hot_events: bool = False
    normalize: bool = False
    eq: bool = False
    voxel_batch: int = 128
    metrics: Tuple[str, ...] = ("p_loss", "mse", "ssim")
    lpips: Optional[Tuple[LPIPS, dict]] = None  # (module, params)
    robust_norm_output: bool = False  # SNN postprocessing
    save_images_to: Optional[str] = None
    show: bool = False  # live cv2.imshow triptych (reference showim :272-276)
    wait_time: int = 1  # cv2.waitKey ms per frame; ESC exits
    shard_data: bool = False  # shard subseq_L chunks over all devices


def _equalize_hist(img: np.ndarray) -> np.ndarray:
    """cv2.equalizeHist on a [0,1] float image, via histogram ops (the
    reference round-trips through uint8, eval_models_seq.py:249-252)."""
    u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    hist = np.bincount(u8.ravel(), minlength=256)
    cdf = hist.cumsum()
    nonzero = cdf[cdf > 0]
    if len(nonzero) == 0:
        return img
    cdf_min = nonzero[0]
    total = cdf[-1]
    if total == cdf_min:
        return img
    lut = np.round((cdf - cdf_min) / (total - cdf_min) * 255.0).clip(0, 255)
    return lut[u8].astype(np.float32) / 255.0


_robust_norm_batch = jax.jit(jax.vmap(lambda im: robust_norm(im, 1, 99)))
# uint8 -> [0,1] float32 on device. The f32 divide is correctly rounded
# (IEEE), while the host's u8/255.0 double-rounds through float64 — they
# differ by at most 1 ulp (6e-8) on a few of the 256 values, the device
# being the more accurate of the two. Pinned by tests/test_eval_driver.py.
_u8_to_unit = jax.jit(lambda x: x.astype(jnp.float32) / 255.0)


@functools.partial(jax.jit, static_argnames=("names",))
def _basic_metric_batch(preds, gts, names: Tuple[str, ...]):
    """All requested non-LPIPS metrics in ONE program: one dispatch + one
    readback instead of one per metric (the remote-TPU tunnel charges
    ~1-2 ms per dispatch, and serial np.asarray readbacks serialize)."""
    fns = {
        "mse": jax.vmap(mse),
        "psnr": jax.vmap(psnr),
        "ssim": jax.vmap(lambda a, b: structural_similarity(a[None], b[None])),
    }
    return {n: fns[n](preds, gts) for n in names if n in fns}
# keyed by the (frozen, hashable) LPIPS module; params are a jit ARGUMENT so
# a fresh params tree never aliases a stale traced closure (an id(params) key
# can be recycled by the GC and serve the wrong weights)
_lpips_cache: Dict[object, Callable] = {}


def _metric_batch(
    preds: jax.Array,  # (T, H, W) in [0,1]
    gts: jax.Array,  # (T, H, W)
    names: Sequence[str],
    lpips_pair,
    lpips_chunk: int = 32,
) -> Dict[str, np.ndarray]:
    """Per-step metric values, batched on device (jit singletons: re-wrapping
    per call would re-trace for every sequence)."""
    out: Dict[str, np.ndarray] = {}
    p4 = preds[..., None]  # (T, H, W, 1)
    g4 = gts[..., None]
    basic = tuple(n for n in ("mse", "psnr", "ssim") if n in names)
    if basic:
        vals = _basic_metric_batch(p4, g4, basic)
        for n in basic:
            out[n] = np.asarray(vals[n])
    if "p_loss" in names:
        if lpips_pair is None:
            raise ValueError(
                "p_loss requested but no LPIPS weights configured "
                "(EvalConfig.lpips); pass --lpips_lin/--lpips_backbone or "
                "drop p_loss from metrics"
            )
        module, params = lpips_pair
        if module not in _lpips_cache:
            _lpips_cache[module] = jax.jit(
                lambda prm, a, b: jax.vmap(
                    lambda x, y: lpips_distance(module, prm, x[None], y[None])
                )(a, b)
            )
        dist_fn = _lpips_cache[module]
        vals = []
        for s in range(0, p4.shape[0], lpips_chunk):
            vals.append(
                np.asarray(
                    dist_fn(params, p4[s : s + lpips_chunk], g4[s : s + lpips_chunk])
                )
            )
        out["p_loss"] = np.concatenate(vals)
    return out


_RUN_FN_CACHE: Dict = {}


def _cached_run_fn(spec: ModelSpec, padded_hw, for_sequence_model: bool):
    """One traced+jitted forward per (architecture, padded size). Params are
    a jit ARGUMENT (not a closure), so a checkpoint sweep over many .pth
    files of the same architecture traces the model once — re-wrapping per
    spec would re-trace (minutes for the flagship) even with the persistent
    compile cache. One jit object serves ALL sequence lengths (ragged tails
    included): jit re-traces per T but shares the cache across sequences —
    an unjitted module.apply tail would run op-by-op, paying the remote
    tunnel's ~1-2 ms per op."""
    arch_key = (
        spec.module.__class__.__name__,
        repr(getattr(spec.module, "config", None)),
        repr(spec.module.dtype),
        padded_hw,
        for_sequence_model,
    )
    if arch_key not in _RUN_FN_CACHE:
        module = spec.module
        if for_sequence_model:
            fn = jax.jit(lambda params, v: module.apply(params, v)[0]["image"])
        else:
            # state in/out: the driver THREADS recurrent state across
            # subseq_L chunks — the reference's per-step loop never resets
            # mid-sequence (eval_models_seq.py:169,209-213; only sequence
            # models chunk-reset, :216-219 + bde2vid.py:31)
            fn = jax.jit(lambda params, v, st: run_sequence(module, params, v, st))
        _RUN_FN_CACHE[arch_key] = fn
    fn = _RUN_FN_CACHE[arch_key]
    if for_sequence_model:
        return lambda v: fn(spec.params, v)
    return lambda v, st: fn(spec.params, v, st)


def _pause_item_map(T: int, pause_st: int, pause_ed: int):
    """Reference pause semantics (eval_models_seq.py:184-189): paused steps
    DEEP-COPY the last real item with zeroed events and do NOT advance the
    dataloader, so the post-pause stream is *delayed* by the pause length,
    not skipped. Returns (item_idx[T], paused[T]): step i scores item
    item_idx[i]; real items consumed = T - (pause_ed - pause_st)."""
    t_idx = np.arange(T)
    paused = (t_idx > pause_st) & (t_idx <= pause_ed)
    item_idx = np.where(
        t_idx <= pause_ed,
        np.minimum(t_idx, pause_st),
        t_idx - (pause_ed - pause_st),
    )
    return item_idx, paused


def evaluate_sequence(
    spec: ModelSpec, seq: EventSequence, cfg: EvalConfig
) -> Tuple[Dict[str, float], Dict[str, List[float]]]:
    """Evaluate one model on one sequence; returns (result, detail)."""
    T = len(seq)
    if (cfg.pause_st is None) != (cfg.pause_ed is None):
        raise ValueError(
            "pause_st and pause_ed must be set together "
            f"(got pause_st={cfg.pause_st}, pause_ed={cfg.pause_ed})"
        )
    if cfg.pause_st is not None and cfg.pause_ed is not None:
        if cfg.pause_ed < cfg.pause_st:
            raise ValueError(
                f"pause_ed ({cfg.pause_ed}) must be >= pause_st "
                f"({cfg.pause_st}) — a negative pause would silently skip "
                "items"
            )
        if cfg.pause_st >= len(seq):
            raise ValueError(
                f"pause_st ({cfg.pause_st}) is beyond the sequence "
                f"({len(seq)} items) — the reference would exhaust the "
                "dataloader before pausing"
            )
        # reference: T = max_length outright (eval_models_seq.py:174-177) —
        # the pause consumes no real items, so the run extends past len(seq).
        # Bound real consumption at len(seq) (the reference would raise
        # StopIteration past it).
        pause_len = cfg.pause_ed - cfg.pause_st
        T = cfg.max_length if cfg.max_length is not None else T + pause_len
        T = min(T, len(seq) + pause_len)
    elif cfg.max_length is not None:
        T = min(T, cfg.max_length)

    h, w = seq.sensor_size
    crop = CropParameters(w, h, spec.num_encoders)

    # ---- assemble voxels (device) + frames (host) -------------------------
    def _read_frames(a: int, b: int) -> np.ndarray:
        """Ground-truth frames for items [a, b): the stored uint8 bytes when
        the backend can supply them (4x less host->device traffic than
        float32 through the remote-TPU tunnel; scaled to [0,1] on device),
        else float32. The eq path needs host floats, so it opts out."""
        if not cfg.eq and hasattr(seq, "frames_u8"):
            u8 = seq.frames_u8(a, b)
            if u8 is not None:
                return u8
        return seq.frames(a, b)

    if cfg.pause_st is not None and cfg.pause_ed is not None:
        if seq.item_last is not None:
            raise ValueError(
                "the pause experiment is not defined for ev_rate-split "
                "(SpadeH5) sequences — the reference never combines them"
            )
        item_idx, paused = _pause_item_map(T, cfg.pause_st, cfg.pause_ed)
        n_real = int(item_idx[-1]) + 1 if T else 0
        voxels = seq.voxels(0, n_real, batch=cfg.voxel_batch)  # (n_real, B, H, W)
        frames = _read_frames(0, n_real)[item_idx]  # (T, H, W)
        voxels = jnp.where(
            jnp.asarray(paused)[:, None, None, None],
            0.0,
            voxels[jnp.asarray(item_idx)],
        )
    elif seq.item_last is not None:
        # SPADE ev_rate mode: all sub-voxels up to item T-1's last
        flat_stop = int(seq.item_last[T - 1]) + 1
        voxels = seq.voxels(0, flat_stop, batch=cfg.voxel_batch)
        frames = _read_frames(0, T)  # (T, H, W)
    else:
        # common path: voxelization is DEFERRED to the forward loop, one
        # forward-chunk at a time, so chunk c+1's event-buffer pack+upload
        # (the host-blocking ~80% of the voxelize phase on the tunneled
        # backend) runs while the device executes chunk c's forward
        voxels = None
        frames = _read_frames(0, T)  # (T, H, W)

    n_steps = T if voxels is None else voxels.shape[0]
    chunk = cfg.subseq_L or n_steps
    use_shard = (
        cfg.shard_data
        and jax.device_count() > 1
        and seq.item_last is None
        # without chunking (or with a single chunk) there is nothing to
        # distribute — padding to n_dev whole-sequence chunks would just
        # burn devices on all-zero inputs
        and cfg.subseq_L is not None
        and n_steps > chunk
    )
    if cfg.shard_data and not use_shard:
        print("note: --shard_data inactive (needs >1 device, subseq_L "
              "chunking with multiple chunks, and no ev_rate splitting)")
    # streaming needs neither the full voxel array (viz does) nor a full x
    # up front (the sharded path does)
    stream = voxels is None and not use_shard and not (
        cfg.save_images_to or cfg.show
    )
    if voxels is None and not stream:
        voxels = seq.voxels(0, T, batch=cfg.voxel_batch)  # (T, B, H, W)

    def _chunk_x(a: int, b: int) -> jax.Array:
        """Voxelize items [a, b) and pad: (b-a, 1, H', W', B) on device."""
        v = seq.voxels(a, b, batch=cfg.voxel_batch)
        return crop.pad(jnp.transpose(v, (0, 2, 3, 1))[:, None])

    if stream:
        x = _chunk_x(0, min(chunk, n_steps))
    else:
        # (T, B, H, W) -> (T, 1, H', W', B) padded NHWC
        x = crop.pad(jnp.transpose(voxels, (0, 2, 3, 1))[:, None])

    # upload the ground truth up front, as raw uint8 when the backend
    # allows: the win is the 4x-smaller payload (device_put is effectively
    # synchronous on the tunneled backend — measured r3 — so this is NOT an
    # async overlap; it merely keeps the transfer out of the metric phase)
    gts_dev = None if cfg.eq else jax.device_put(frames)

    # ---- model forward (scan per chunk, state reset at chunk boundary) ----
    preds = []
    padded_hw = (x.shape[2], x.shape[3])
    if use_shard:
        # chunks shard over the mesh's 'data' axis (exactness vs the
        # chunk-reset semantics proven in tests/test_sharded_eval.py).
        # For SEQUENCE models chunk independence is the reference's own
        # semantic (state resets per call); for step models sharding
        # NECESSARILY resets recurrent state at chunk boundaries — a
        # documented divergence from the sequential default (which
        # threads state), traded for multi-chip throughput.
        from bde2vid_tpu.parallel.sharded_eval import eval_chunks_sharded

        if not spec.is_sequence_model:
            print("note: --shard_data resets recurrent state every "
                  f"{chunk} steps (chunk independence is what shards)")
        preds = [eval_chunks_sharded(spec, x, chunk)]
    elif spec.is_sequence_model:
        # BDE2VID-style: the whole (sub)sequence is one forward; the
        # reference resets state per call (bde2vid.py:31), so chunks are
        # independent (eval_models_seq.py:216-219)
        run = _cached_run_fn(spec, padded_hw, True)
        if stream:
            s, cur = 0, x
            while s < n_steps:
                s_next = min(s + chunk, n_steps)
                preds.append(run(cur))  # async dispatch — device starts now
                s = s_next
                if s < n_steps:
                    # pack + upload the NEXT chunk's events while the device
                    # runs the current forward (the upload blocks the host,
                    # not the device)
                    cur = _chunk_x(s, min(s + chunk, n_steps))
        else:
            for s in range(0, n_steps, chunk):
                # the one jitted fn serves full chunks AND the ragged tail
                # (jit re-traces per length; tail lengths recur across
                # sequences)
                preds.append(run(x[s : s + chunk]))
    else:
        # step models: state THREADS across chunks (the reference's
        # per-step loop carries state for the whole run and resets only
        # once up front, eval_models_seq.py:169; chunk resets are a
        # sequence-model-only semantic). subseq_L here only bounds the
        # per-dispatch scan length.
        state = spec.module.initial_state(1, *padded_hw)
        run = _cached_run_fn(spec, padded_hw, False)
        if stream:
            def _stream_pieces():
                s, cur = 0, x
                while s < n_steps:
                    s_next = min(s + chunk, n_steps)
                    yield cur  # consumer dispatches the forward, then...
                    s = s_next
                    if s < n_steps:
                        # ...the next chunk's upload overlaps that forward
                        cur = _chunk_x(s, min(s + chunk, n_steps))
            pieces = _stream_pieces()
        else:
            pieces = (x[s : s + chunk] for s in range(0, n_steps, chunk))
        for piece in pieces:
            tail = chunk - piece.shape[0]
            if tail > 0:
                # forward-only recurrence: zero-padding the END of a chunk
                # cannot affect earlier outputs, so the tail reuses the one
                # compiled chunk shape (a ragged BDE2VID tail cannot — its
                # backward sweep would see the padding — and keeps its own
                # compile in the sequence-model branch above). The returned
                # state absorbed the zero steps, but a tail only occurs on
                # the LAST chunk, after which state is dead.
                piece = jnp.concatenate(
                    [piece, jnp.zeros((tail, *piece.shape[1:]), piece.dtype)]
                )
                imgs, state = run(piece, state)
                imgs = imgs[: chunk - tail]
            else:
                imgs, state = run(piece, state)
            preds.append(imgs)
    preds = jnp.concatenate(preds, axis=0)  # (T, 1, H', W', 1)

    if seq.item_last is not None:
        # item prediction = last sub-voxel's output (reference SPADE wrapper
        # loops sub-voxels and returns the final pred, spade_e2v.py:33-37)
        preds = preds[jnp.asarray(seq.item_last[:T])]

    preds = crop.crop(preds)[:, 0, :, :, 0]  # (T, H, W)

    # ---- postprocessing ----------------------------------------------------
    if cfg.robust_norm_output:
        preds = _robust_norm_batch(preds)
    if cfg.eq:
        # eq works on host floats (frames is float32 here: _read_frames
        # only returns uint8 when eq is off)
        preds = jnp.asarray(
            np.stack([_equalize_hist(p) for p in np.asarray(preds)])
        )
        gts = jnp.asarray(np.stack([_equalize_hist(g) for g in frames]))
    else:
        gts = _u8_to_unit(gts_dev) if frames.dtype == np.uint8 else gts_dev

    if cfg.save_images_to or cfg.show:
        ev = voxels
        if seq.item_last is not None:  # align sub-voxel frames with items
            ev = ev[jnp.asarray(seq.item_last[:T])]
        ev_frame = np.asarray(jnp.sum(ev, axis=1))
        gt_f32 = (
            frames.astype(np.float32) / 255.0
            if frames.dtype == np.uint8
            else frames
        )
        if cfg.save_images_to:
            os.makedirs(cfg.save_images_to, exist_ok=True)
            _save_triptychs(cfg.save_images_to, ev_frame, np.asarray(preds), gt_f32)
        if cfg.show:
            _show_triptychs(ev_frame, np.asarray(preds), gt_f32, cfg.wait_time)

    # ---- metrics -----------------------------------------------------------
    detail = _metric_batch(preds, gts, cfg.metrics, cfg.lpips)
    result = {name: float(np.sum(vals) / T) for name, vals in detail.items()}
    detail = {name: [float(v) for v in vals] for name, vals in detail.items()}
    return result, detail


def _triptych(ev_i, pred_i, gt_i) -> np.ndarray:
    """[event frame | prediction | ground truth] uint8 strip
    (reference eval_models_seq.py:263-264)."""
    rng = ev_i.max() - ev_i.min()
    e = (ev_i - ev_i.min()) / (rng + 1e-6)
    img = np.concatenate([e, pred_i, gt_i], axis=1)
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def _save_triptychs(folder, ev, pred, gt):
    """Triptych PNG dump (reference saveim :266-270)."""
    try:
        import cv2
    except ImportError:
        cv2 = None
    for i in range(len(pred)):
        img = _triptych(ev[i], pred[i], gt[i])
        path = os.path.join(folder, f"frame_{i:010d}.png")
        if cv2 is not None:
            cv2.imwrite(path, img)
        else:  # minimal PNG writer fallback
            from bde2vid_tpu.utils.png import write_gray_png

            write_gray_png(path, img)


def _show_triptychs(ev, pred, gt, wait_time: int = 1):
    """Live cv2.imshow loop, ESC quits the whole run (reference showim
    :272-276 exits with code 0). Degrades to a warning when cv2 is missing
    or no display is available (headless)."""
    try:
        import cv2
    except ImportError:
        print("warning: --show requested but cv2 is not available")
        return
    # Qt's headless failure is a hard abort() that except can't catch —
    # check for a display up front instead.
    if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")):
        print("warning: --show disabled (no display in this environment)")
        return
    for i in range(len(pred)):
        img = _triptych(ev[i], pred[i], gt[i])
        try:
            cv2.imshow("result", img)
            key = cv2.waitKey(wait_time) & 0xFF
        except cv2.error as err:
            print(f"warning: --show disabled ({err})")
            return
        if key == 27:  # ESC
            raise SystemExit(0)


def evaluate_all(
    spec: ModelSpec,
    datafiles: Sequence[str],
    data_dir: str,
    result_file: str,
    cfg: EvalConfig,
    progress: bool = True,
) -> Dict:
    """Evaluate a model over many sequences; write result/detail JSON + table
    (reference eval_model_alldata :99-144, incl. the result-file skip lock)."""
    from bde2vid_tpu.eval.tables import generate_table

    if os.path.exists(result_file):
        print(f"skipping {result_file} (exists)")
        return {}
    results = collections.defaultdict(dict)
    details = collections.defaultdict(dict)
    ltype = cfg.ltype
    if spec.name == "SPADEE2VID" and ltype == "H5":
        ltype = "SpadeH5"  # reference pairs SPADE with ev_rate splitting

    def open_seq(datafile):
        return load_sequence(
            os.path.join(data_dir, datafile),
            num_bins=cfg.num_bins,
            combined_voxel_channels=cfg.combined_voxel_channels,
            hot_filter=cfg.filter_hot_events,
            normalize=cfg.normalize,
            ltype=ltype,
        )

    # overlap the NEXT sequence's host-side open/index work with the current
    # device compute (the torch DataLoader-workers analog at sequence level)
    from concurrent.futures import ThreadPoolExecutor

    it = datafiles
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(datafiles)
        except ImportError:
            pass
    pool = ThreadPoolExecutor(max_workers=1)
    pending = pool.submit(open_seq, datafiles[0]) if datafiles else None
    for i, datafile in enumerate(it):
        dataset_name, filename = os.path.split(datafile)
        dataset_name = os.path.basename(dataset_name) or "unknown"
        filename = filename.split(".h5")[0]
        seq = pending.result()
        if i + 1 < len(datafiles):
            pending = pool.submit(open_seq, datafiles[i + 1])
        result, detail = evaluate_sequence(spec, seq, cfg)
        seq.reader.close()
        results[dataset_name][filename] = result
        details[dataset_name][filename] = detail
    pool.shutdown()

    os.makedirs(os.path.dirname(result_file) or ".", exist_ok=True)
    with open(result_file, "w") as fp:
        json.dump(results, fp)
    # splitext, not str.replace('.txt', ...): a non-.txt result_file (public
    # API callers) would otherwise alias all three paths onto result_file,
    # clobbering the results with the detail dump
    root, ext = os.path.splitext(result_file)
    with open(f"{root}_detail{ext or '.txt'}", "w") as fp:
        json.dump(details, fp)
    generate_table([result_file], f"{root}_table{ext or '.txt'}")
    return dict(results)
