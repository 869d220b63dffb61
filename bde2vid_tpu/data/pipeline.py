"""Sequence assembly: h5 file -> padded event windows -> device voxel grids.

Mirrors the reference item surface (h5_dataset.py __getitem__ :204-259:
{'frame','flow','events','timestamp','data_source_idx','dt'}), with the
voxel grid built on device. Reference edge cases preserved:

- windows with < 3 events produce a zero voxel (:219-220)
- dt == 0 forced to 0.0 (:230-231)
- hot-pixel mask multiplied into every voxel (:364)
- flow is scaled by dt to displacement (:239-241); zero flow if absent
- LegacyNorm applied to voxels only when ``normalize`` (the reference wires
  this through vox_transform, eval_models_seq.py:159-161)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bde2vid_tpu.events.h5_io import H5EventReader
from bde2vid_tpu.events.voxel import (
    _bucket_capacity,
    events_to_neg_pos_voxel_batch,
    events_to_voxel_batch,
    hot_event_mask,
)
from bde2vid_tpu.data.windowing import (
    between_frames_windows,
    k_events_windows,
    t_seconds_windows,
)
from bde2vid_tpu.utils.norm import legacy_norm

DATA_SOURCES = ("esim", "ijrr", "mvsec", "eccd", "hqfd", "unknown")

# ONE jitted vmapped voxelizer per configuration — wrapping jax.jit around a
# fresh closure per batch would re-trace the identical program once per
# 128-window batch and per sequence (the hot mask is therefore an ARGUMENT,
# not a capture; a scalar zero stands in when unused)
_VOXELIZE_FN_CACHE: Dict[Tuple, object] = {}


_legacy_norm_batch = None  # lazily jitted once (module import must stay cheap)


def _legacy_norm_all(v):
    global _legacy_norm_batch
    if _legacy_norm_batch is None:
        _legacy_norm_batch = jax.jit(jax.vmap(legacy_norm))
    return _legacy_norm_batch(v)


def _cached_voxelize_fn(num_bins, sensor, combined, normalize, use_hot_mask):
    key = (num_bins, sensor, combined, normalize, use_hot_mask)
    if key not in _VOXELIZE_FN_CACHE:

        def batch(xs, ys, ts, ps, ns, mask):
            # the packer ships compact dtypes (int16 coords, int8 polarity:
            # 9 B/event vs 16 through the ~100 MB/s tunnel); upcast on chip
            xs, ys = xs.astype(jnp.int32), ys.astype(jnp.int32)
            ps = ps.astype(jnp.float32)
            # whole batch + both polarities in ONE flat scatter — a vmapped
            # per-window scatter lowers ~4x slower on TPU (bench_voxel)
            if combined:
                v = events_to_voxel_batch(
                    xs, ys, ts, ps, ns, num_bins=num_bins, sensor_size=sensor
                )  # (C, B, H, W)
            else:
                vp, vn = events_to_neg_pos_voxel_batch(
                    xs, ys, ts, ps, ns, num_bins=num_bins, sensor_size=sensor
                )
                v = jnp.concatenate([vp, vn], axis=1)
            small = (ns < 3)[:, None, None, None]  # reference: <3 events -> 0
            v = jnp.where(small, jnp.zeros_like(v), v)
            if use_hot_mask:
                v = v * mask[None, None]
            if normalize:
                v = jax.vmap(legacy_norm)(v)
            return v

        _VOXELIZE_FN_CACHE[key] = jax.jit(batch)
    return _VOXELIZE_FN_CACHE[key]


def _pack_to_bytes(xs, ys, ts, ps, ns) -> np.ndarray:
    """Fuse the five packed window buffers into ONE flat uint8 buffer.

    The remote-TPU tunnel charges ~9 ms latency PER device_put (measured:
    five puts of a 0.66 MB training window cost 44 ms, ~7x the bytes'
    bandwidth cost). One buffer -> one put; the voxelize jit bitcasts the
    slices back (little-endian on both sides). Layout: ts f32 | ns i32 |
    xs i16 | ys i16 | ps i8."""
    return np.concatenate(
        [
            np.ascontiguousarray(ts, np.float32).view(np.uint8).ravel(),
            np.ascontiguousarray(ns, np.int32).view(np.uint8).ravel(),
            np.ascontiguousarray(xs, np.int16).view(np.uint8).ravel(),
            np.ascontiguousarray(ys, np.int16).view(np.uint8).ravel(),
            np.ascontiguousarray(ps, np.int8).view(np.uint8).ravel(),
        ]
    )


def _unpack_bytes(buf, n_windows: int, capacity: int):
    """Device-side inverse of _pack_to_bytes (inside jit; static shapes)."""
    w, c = n_windows, capacity
    expect = 9 * w * c + 4 * w  # ts f32 + xs/ys i16 + ps i8 + ns i32
    if buf.shape[0] != expect:
        raise ValueError(
            f"packed buffer size {buf.shape[0]} != expected {expect} for "
            f"(n_windows={w}, capacity={c}) — a silent mismatch here would "
            "bitcast garbage"
        )
    off = 0
    ts = jax.lax.bitcast_convert_type(
        buf[off : off + 4 * w * c].reshape(w, c, 4), jnp.float32
    )
    off += 4 * w * c
    ns = jax.lax.bitcast_convert_type(buf[off : off + 4 * w].reshape(w, 4), jnp.int32)
    off += 4 * w
    xs = jax.lax.bitcast_convert_type(
        buf[off : off + 2 * w * c].reshape(w, c, 2), jnp.int16
    )
    off += 2 * w * c
    ys = jax.lax.bitcast_convert_type(
        buf[off : off + 2 * w * c].reshape(w, c, 2), jnp.int16
    )
    off += 2 * w * c
    ps = jax.lax.bitcast_convert_type(buf[off : off + w * c].reshape(w, c), jnp.int8)
    return xs, ys, ts, ps, ns


def _cached_voxelize_bytes_fn(
    num_bins, sensor, combined, normalize, use_hot_mask, n_windows, capacity
):
    """One-put voxelizer: uint8 buffer in, voxels out. Cached per config AND
    batch shape (tail batches get their own small trace)."""
    key = (num_bins, sensor, combined, normalize, use_hot_mask, n_windows, capacity)
    if key not in _VOXELIZE_FN_CACHE:
        inner = _cached_voxelize_fn(num_bins, sensor, combined, normalize, use_hot_mask)

        def from_bytes(buf, mask):
            return inner(*_unpack_bytes(buf, n_windows, capacity), mask)

        _VOXELIZE_FN_CACHE[key] = jax.jit(from_bytes)
    return _VOXELIZE_FN_CACHE[key]


def _span_bucket(n: int, min_capacity: int = 16384) -> int:
    """Sixteenth-octave size bucket: next multiple of pow2_ceil(n)/16 >= n.
    Bounds padding at 12.5% (a pow2 bucket wastes up to ~2x — on the span
    upload that padding is REAL transfer bytes, unlike the window capacity
    where it is local gather width) while keeping the distinct-shape count,
    and thus voxelize-jit retraces, to at most 16 per octave (in practice a
    sequence produces only 2-3 distinct span sizes)."""
    if n <= min_capacity:
        return min_capacity
    k = (n - 1).bit_length() - 4  # 2^k = pow2_ceil(n) / 16
    step = 1 << k
    return ((n + step - 1) // step) * step


def _no_span_upload() -> bool:
    """Value-aware parse of the BDE2VID_NO_SPAN_UPLOAD A/B knob: "=0" /
    "=false" / "=no" mean OFF (bare truthiness would read "0" as
    disable-the-span-path, inverting the A/B)."""
    return os.environ.get("BDE2VID_NO_SPAN_UPLOAD", "").strip().lower() not in (
        "", "0", "false", "no"
    )


def _pack_span_to_bytes(ts_rel, starts, ns, xs, ys, ps) -> np.ndarray:
    """Fuse a raw UNPADDED event span + window index table into one uint8
    buffer (same one-put rationale as _pack_to_bytes). The padded (W, cap)
    window buffers are reconstructed ON DEVICE by gather (_unpack_span) —
    the upload sheds all per-window padding, which at 9 B/event through the
    ~100 MB/s tunnel is the dominant eval-phase cost when window sizes are
    skewed (capacity is the pow2 bucket of the LARGEST window). Layout:
    ts f32 | starts i32 | ns i32 | xs i16 | ys i16 | ps u8."""
    return np.concatenate(
        [
            np.ascontiguousarray(ts_rel, np.float32).view(np.uint8).ravel(),
            np.ascontiguousarray(starts, np.int32).view(np.uint8).ravel(),
            np.ascontiguousarray(ns, np.int32).view(np.uint8).ravel(),
            np.ascontiguousarray(xs, np.int16).view(np.uint8).ravel(),
            np.ascontiguousarray(ys, np.int16).view(np.uint8).ravel(),
            np.ascontiguousarray(ps, np.uint8).ravel(),
        ]
    )


def _unpack_span(buf, n_windows: int, span_cap: int):
    """Device-side inverse of _pack_span_to_bytes (inside jit)."""
    w, s = n_windows, span_cap
    expect = 9 * s + 8 * w
    if buf.shape[0] != expect:
        raise ValueError(
            f"packed span size {buf.shape[0]} != expected {expect} for "
            f"(n_windows={w}, span_cap={s})"
        )
    off = 0
    ts = jax.lax.bitcast_convert_type(buf[off : off + 4 * s].reshape(s, 4), jnp.float32)
    off += 4 * s
    starts = jax.lax.bitcast_convert_type(
        buf[off : off + 4 * w].reshape(w, 4), jnp.int32
    )
    off += 4 * w
    ns = jax.lax.bitcast_convert_type(buf[off : off + 4 * w].reshape(w, 4), jnp.int32)
    off += 4 * w
    xs = jax.lax.bitcast_convert_type(buf[off : off + 2 * s].reshape(s, 2), jnp.int16)
    off += 2 * s
    ys = jax.lax.bitcast_convert_type(buf[off : off + 2 * s].reshape(s, 2), jnp.int16)
    off += 2 * s
    ps = buf[off : off + s]
    return ts, starts, ns, xs, ys, ps


def _cached_voxelize_span_fn(
    num_bins, sensor, combined, normalize, use_hot_mask, n_windows, capacity, span_cap
):
    """Span-upload voxelizer: raw unpadded events in, voxels out. The padded
    per-window view is a clamped gather — index start + min(i, n-1), which
    replicates pack_windows' padding semantics bit-exactly (padding beyond n
    carries the last event's ts — the value the voxelizer's dt logic reads —
    and zero polarity, a scatter no-op)."""
    key = ("span", num_bins, sensor, combined, normalize, use_hot_mask,
           n_windows, capacity, span_cap)
    if key not in _VOXELIZE_FN_CACHE:
        inner = _cached_voxelize_fn(num_bins, sensor, combined, normalize, use_hot_mask)

        def from_span(buf, mask):
            ts, starts, ns, xs, ys, ps = _unpack_span(buf, n_windows, span_cap)
            i = jnp.arange(capacity, dtype=jnp.int32)[None, :]
            n = ns[:, None]
            idx = starts[:, None] + jnp.minimum(i, jnp.maximum(n - 1, 0))
            idx = jnp.clip(idx, 0, span_cap - 1)
            valid = i < n
            gxs = jnp.where(valid, xs[idx], 0)
            gys = jnp.where(valid, ys[idx], 0)
            gts = ts[idx]  # clamp -> last valid ts beyond n (pack fill)
            # pm1 via comparison, not 2p-1: raw polarity may be stored as
            # 255 (pack_windows uses ps > 0 for the same reason)
            gps = jnp.where(
                valid, jnp.where(ps[idx] > 0, 1, -1), 0
            ).astype(jnp.int8)
            return inner(gxs, gys, gts, gps, ns, mask)

        _VOXELIZE_FN_CACHE[key] = jax.jit(from_span)
    return _VOXELIZE_FN_CACHE[key]


@dataclasses.dataclass
class SequenceItem:
    """One eval step (host-side)."""

    frame: Optional[np.ndarray]  # (H, W) float32 in [0,1], or None
    flow: Optional[np.ndarray]  # (2, H, W) displacement, or None
    events: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]  # padded
    n_events: int
    timestamp: float
    dt: float
    data_source_idx: int


class EventSequence:
    """A fully-indexed event sequence ready for device voxelization.

    All windows are padded to ONE per-sequence capacity (power-of-two bucket
    of the largest window) so the whole sequence voxelizes under a single jit
    compilation, vmapped over steps.
    """

    def __init__(
        self,
        reader: H5EventReader,
        windows: np.ndarray,
        num_bins: int = 5,
        combined_voxel_channels: bool = True,
        hot_filter: bool = False,
        normalize: bool = False,
        sensor_resolution: Optional[Tuple[int, int]] = None,
        has_frames: bool = True,
        max_length: Optional[int] = None,
        ev_rate: Optional[float] = None,
        trim_last_frame: bool = True,
    ):
        self.reader = reader
        self.item_windows = np.asarray(windows, np.int64)
        self.num_bins = num_bins
        self.combined = combined_voxel_channels
        self.normalize = normalize
        self.sensor_size = tuple(sensor_resolution or reader.sensor_size)
        self.has_frames = has_frames
        self.length = len(self.item_windows)
        if has_frames:
            # h5 between_frames protocol: num_frames-1 items (reference
            # __len__, h5_dataset.py:306-307). Explicit-window backends
            # (raw NPY) keep one item per frame (dataset.py:248-255).
            n_items = reader.num_frames - (1 if trim_last_frame else 0)
            self.length = min(self.length, n_items) if reader.num_frames else 0
        if max_length is not None:
            self.length = min(self.length, max_length + 1)
        if self.length <= 0:
            raise ValueError("sequence has zero usable steps")

        # SPADE event-rate splitting (reference SpadeE2VDataset,
        # h5_dataset.py:486-565): each item window splits into
        # len(events) // (H*W*ev_rate) equal sub-windows; the model consumes
        # them sequentially and the item's prediction is the LAST one.
        self.item_last: Optional[np.ndarray] = None
        if ev_rate is not None:
            num_pixels = self.sensor_size[0] * self.sensor_size[1]
            flat = []
            last = []
            for i in range(self.length):
                i0, i1 = self.item_windows[i]
                n = int(i1 - i0)
                # reference SpadeE2VDataset (h5_dataset.py:513-517):
                # num_vox from FLOAT floor division, then np.array_split
                # boundaries (the first n % num_vox chunks get one extra)
                num_vox = max(int(n // (num_pixels * ev_rate)), 1)
                base, extra = divmod(n, num_vox)
                start = int(i0)
                for j in range(num_vox):
                    size = base + (1 if j < extra else 0)
                    flat.append([start, start + size])
                    start += size
                last.append(len(flat) - 1)
            self.windows = np.asarray(flat, np.int64)
            self.item_last = np.asarray(last, np.int64)
        else:
            self.windows = self.item_windows[: self.length]

        sizes = self.windows[:, 1] - self.windows[:, 0]
        self.capacity = _bucket_capacity(int(sizes.max()) if len(sizes) else 1)

        src = "unknown"
        try:
            src = reader.f.attrs.get("source", "unknown")
            src = src.decode() if isinstance(src, bytes) else str(src)
        except Exception:
            pass
        self.data_source_idx = DATA_SOURCES.index(src) if src in DATA_SOURCES else -1

        if hot_filter:
            sl = reader.events(0, min(reader.num_events, 2_000_000))
            self.hot_mask = hot_event_mask(
                sl.xs, sl.ys, np.abs(sl.ps), self.sensor_size, num_hot=100
            )
        else:
            self.hot_mask = None

    def __len__(self) -> int:
        return self.length

    # -- host item surface ---------------------------------------------------

    def raw_window(self, i: int):
        """Padded (xs, ys, ts, ps, n) for step i; ts shifted to window start
        (reference shifts by ts_0 before voxelizing, h5_dataset.py:226)."""
        idx0, idx1 = self.windows[i]
        sl = self.reader.events(int(idx0), int(idx1))
        n = len(sl.xs)
        cap = self.capacity
        xs = np.zeros(cap, np.int32)
        ys = np.zeros(cap, np.int32)
        ts = np.zeros(cap, np.float32)
        ps = np.zeros(cap, np.float32)
        xs[:n] = sl.xs
        ys[:n] = sl.ys
        if n:
            ts[:n] = sl.ts - sl.ts[0]
            ts[n:] = ts[n - 1] if n else 0.0
        ps[:n] = sl.ps
        return xs, ys, ts, ps, n

    def item(self, i: int) -> SequenceItem:
        if self.item_last is not None:
            # under ev_rate splitting, self.windows holds FLAT sub-windows;
            # pairing sub-window i with frame i would silently mismatch
            # events and ground truth. The device path (voxels() +
            # item_last) is the supported surface there.
            raise ValueError(
                "item() is undefined for ev_rate-split (SpadeH5) sequences "
                "— iterate voxels() and map items via item_last"
            )
        xs, ys, ts, ps, n = self.raw_window(i)
        # f64 raw-timestamp difference, not the f32 relative ts: the
        # reference takes ts_0/ts_k BEFORE its f32 cast (h5_dataset.py:
        # 215-217,229), so dt carries full f64 precision
        i0, i1 = self.windows[i]
        tf, tl = self.reader.ts_bounds(int(i0), int(i1))
        dt = tl - tf if n > 0 else 0.0
        frame = self.reader.frame(i) if self.has_frames else None
        flow = None
        if self.has_frames and self.reader.num_flow > i:
            flow = self.reader.flow(i) * dt
        timestamp = float(self.reader.frame_timestamps[i]) if self.has_frames else (
            float(ts[n - 1]) if n else 0.0
        )
        return SequenceItem(
            frame=frame,
            flow=flow,
            events=(xs, ys, ts, ps),
            n_events=n,
            timestamp=timestamp,
            dt=dt,
            data_source_idx=self.data_source_idx,
        )

    # -- device voxelization ---------------------------------------------------

    def _voxelize_batch(self, xs, ys, ts, ps, ns):
        """[C, cap] event buffers -> [C, B, H, W] voxels, on device."""
        fn = _cached_voxelize_fn(
            self.num_bins,
            self.sensor_size,
            self.combined,
            self.normalize,
            self.hot_mask is not None,
        )
        mask = (
            jnp.asarray(self.hot_mask)
            if self.hot_mask is not None
            else jnp.zeros((), jnp.float32)
        )
        return fn(xs, ys, ts, ps, ns, mask)

    def voxels(self, start: int = 0, stop: Optional[int] = None, batch: int = 64):
        """Voxel grids for (flat) windows [start, stop) as a device array
        [T, B, H, W] (or [T, 2B, H, W] for separate polarities). With
        ev_rate splitting there are more flat windows than items; use
        ``item_last`` to map items to their final sub-voxel."""
        n_windows = len(self.windows)
        stop = n_windows if stop is None else min(stop, n_windows)
        out = []
        mask = (
            jnp.asarray(self.hot_mask)
            if self.hot_mask is not None
            else jnp.zeros((), jnp.float32)
        )
        for s in range(start, stop, batch):
            e = min(s + batch, stop)
            span = self._pack_span_batch(s, e)
            # ONE device_put per batch (the tunnel charges ~9 ms latency
            # per put; see _pack_to_bytes) + one jit call. The span form
            # (raw unpadded events + window table, expanded by gather on
            # device) ships fewer bytes whenever windows pad; it requires
            # non-overlapping windows and a gap-free-enough span
            # (_pack_span_batch returns None otherwise -> padded path).
            if span is not None and not _no_span_upload():
                buf, span_cap = span
                fn = _cached_voxelize_span_fn(
                    self.num_bins,
                    self.sensor_size,
                    self.combined,
                    self.normalize,
                    self.hot_mask is not None,
                    e - s,
                    self.capacity,
                    span_cap,
                )
                out.append(fn(buf, mask))
                continue
            packed = self._pack_batch(s, e)
            fn = _cached_voxelize_bytes_fn(
                self.num_bins,
                self.sensor_size,
                self.combined,
                self.normalize,
                self.hot_mask is not None,
                e - s,
                self.capacity,
            )
            out.append(fn(_pack_to_bytes(*packed), mask))
        return jnp.concatenate(out, axis=0)

    def _pack_batch(self, s: int, e: int):
        """Assemble padded (e-s, capacity) buffers: ONE reader span read +
        one native pack_windows call (C++; NumPy fallback inside)."""
        from bde2vid_tpu.native import pack_windows

        wins = self.windows[s:e]
        span0 = int(wins[:, 0].min())
        span1 = int(wins[:, 1].max())
        rxs, rys, rts, rps = self.reader.raw_events(span0, span1)
        rebased = wins - span0
        return pack_windows(rxs, rys, rts, rps, rebased, self.capacity)

    def _pack_span_batch(self, s: int, e: int):
        """Assemble the RAW-SPAN upload for windows [s, e): one fused uint8
        buffer of the unpadded event span (ts pre-rebased per window in f64
        on host, so the device gather reproduces pack_windows bit-exactly)
        plus the window [start, n) table. Returns (buf, span_cap), or None
        when the layout disqualifies it (overlapping windows — an event
        would need two different window rebases — or a span so gappy the
        padded form is smaller)."""
        wins = self.windows[s:e]
        if len(wins) > 1 and (wins[1:, 0] < wins[:-1, 1]).any():
            return None  # overlapping windows (k_events sliding, HFR)
        span0 = int(wins[:, 0].min())
        span1 = int(wins[:, 1].max())
        n_span = span1 - span0
        # bytes ACTUALLY shipped: the span buffer is padded to
        # _span_bucket(n_span) (min-capacity floor + sixteenth-octave
        # rounding), so compare the bucketed size — the raw n_span guard
        # picked the span path for small/tail batches where the 16384-event
        # floor ships several times MORE than the padded form
        if 9 * _span_bucket(n_span) + 8 * len(wins) >= 9 * len(wins) * self.capacity:
            return None
        rxs, rys, rts, rps = self.reader.raw_events(span0, span1)
        rebased = wins - span0
        ts_rel = np.zeros(n_span, np.float32)
        rts = np.asarray(rts, np.float64)
        for i0, i1 in rebased:
            if i1 > i0:  # f64 rebase THEN f32 cast — pack_windows' exact op
                ts_rel[i0:i1] = (rts[i0:i1] - rts[i0]).astype(np.float32)
        span_cap = _span_bucket(n_span)
        pad = span_cap - n_span
        if pad:
            ts_rel = np.concatenate([ts_rel, np.zeros(pad, np.float32)])
            rxs = np.concatenate([np.asarray(rxs, np.int16), np.zeros(pad, np.int16)])
            rys = np.concatenate([np.asarray(rys, np.int16), np.zeros(pad, np.int16)])
            rps = np.concatenate([np.asarray(rps, np.uint8), np.zeros(pad, np.uint8)])
        else:
            rxs = np.asarray(rxs, np.int16)
            rys = np.asarray(rys, np.int16)
            rps = np.asarray(rps, np.uint8)
        buf = _pack_span_to_bytes(
            ts_rel,
            rebased[:, 0].astype(np.int32),
            (rebased[:, 1] - rebased[:, 0]).astype(np.int32),
            rxs,
            rys,
            rps,
        )
        return buf, span_cap

    def frames(self, start: int = 0, stop: Optional[int] = None) -> np.ndarray:
        stop = self.length if stop is None else min(stop, self.length)
        return np.stack([self.reader.frame(i) for i in range(start, stop)])

    def flows(
        self, start: int = 0, stop: Optional[int] = None
    ) -> Optional[np.ndarray]:
        """(T, H, W, 2) per-window DISPLACEMENT flows for windows
        [start, stop), or None when the file carries no flow for the range
        (or windows are ev_rate sub-splits, where per-window flow pairing
        is undefined). Displacement = stored flow * window duration — the
        same scaling item() applies (reference h5_dataset.py:239-241);
        the training CLI stacks these for TemporalConsistencyLoss."""
        stop = self.length if stop is None else min(stop, self.length)
        if (
            not self.has_frames
            or self.item_last is not None
            or getattr(self.reader, "num_flow", 0) < stop
        ):
            return None
        out = []
        for i in range(start, stop):
            i0, i1 = self.windows[i]
            # boundary timestamps only: reading the full event slice per
            # window just for dt dominated host window assembly; two f64
            # scalar reads match the reference's f64 ts_k - ts_0
            # (h5_dataset.py:215-217,229) exactly
            tf, tl = self.reader.ts_bounds(int(i0), int(i1))
            out.append(np.transpose(self.reader.flow(i) * (tl - tf), (1, 2, 0)))
        return np.stack(out).astype(np.float32)

    def frames_u8(
        self, start: int = 0, stop: Optional[int] = None
    ) -> Optional[np.ndarray]:
        """(T, H, W) uint8 frames exactly as stored, or None when any frame
        is not single-channel uint8. When available, ``frames() ==
        frames_u8() / 255`` bit-exactly — the eval driver ships these raw
        bytes to the device (4x less tunnel traffic than float32) and
        scales there."""
        stop = self.length if stop is None else min(stop, self.length)
        raw_fn = getattr(self.reader, "frame_raw", None)
        if raw_fn is None:  # MMP/NPY readers store float frames only
            return None
        # metadata-only probe of the FIRST frame: storage format is per-file
        # in practice, so this decides the fallback without reading pixels
        # the caller would re-read via frames() — while probing EVERY frame
        # (tried first) doubles h5 object opens and measurably slows the
        # common all-uint8 path. A mid-range format flip still bails via the
        # None check below (paying one partial read, rare by construction).
        is_u8 = getattr(self.reader, "frame_is_u8", None)
        if stop > start and is_u8 is not None and not is_u8(start):
            return None
        out = []
        for i in range(start, stop):
            raw = raw_fn(i)
            if raw is None:
                return None
            out.append(raw)
        return np.stack(out) if out else None


def load_sequence(
    path: str,
    num_bins: int = 5,
    voxel_method: Optional[Dict] = None,
    combined_voxel_channels: bool = True,
    hot_filter: bool = False,
    normalize: bool = False,
    sensor_resolution: Optional[Tuple[int, int]] = None,
    max_length: Optional[int] = None,
    ltype: str = "H5",
    ev_rate: Optional[float] = None,
    k_framerate: int = 1,
) -> EventSequence:
    """Open an event sequence with a windowing policy (reference
    InferenceDataLoader backend dispatch, h5_dataset.py:19-42:
    H5 | SpadeH5 (ev_rate splitting) | MMP (RPG memmap dir); plus the HFR
    k_framerate variant, h5_dataset.py:458-483)."""
    voxel_method = voxel_method or {"method": "between_frames"}
    if ltype in ("H5", "SpadeH5"):
        reader = H5EventReader(path)
        if ltype == "SpadeH5" and ev_rate is None:
            ev_rate = 0.35
    elif ltype == "MMP":
        from bde2vid_tpu.events.tools import MemMapEventReader

        reader = MemMapEventReader(path)
    elif ltype == "ENPY":
        from bde2vid_tpu.events.tools import NPYEventReader

        reader = NPYEventReader(path)
    elif ltype == "NPY":
        return PrevoxelizedSequence(path, normalize=normalize, max_length=max_length)
    elif ltype == "H5VOX":
        return H5VoxelCacheSequence(
            path, num_bins=num_bins, normalize=normalize, max_length=max_length,
            combined_voxel_channels=combined_voxel_channels,
        )
    else:
        raise ValueError(f"unknown loader type {ltype!r}")
    method = voxel_method["method"]
    trim_last_frame = True
    if method == "between_frames":
        if k_framerate > 1:
            windows = hfr_windows(reader, k_framerate)
        elif hasattr(reader, "frame_windows"):
            trim_last_frame = False  # one item per frame in this layout
            # raw-NPY layout stores EXPLICIT [idx0, idx1) pairs which need
            # not be contiguous (reference SynchronizedNPYDataset reads
            # frame_event_idxes.txt pairs verbatim, dataset.py:305-309)
            windows = np.asarray(reader.frame_windows, np.int64)
        else:
            windows = between_frames_windows(reader.frame_event_indices)
        has_frames = True
    elif method == "k_events":
        windows = k_events_windows(
            reader.num_events, voxel_method["k"], voxel_method.get("sliding_window_w", 0)
        )
        has_frames = False
    elif method == "t_seconds":
        try:
            duration = float(reader.f.attrs.get("duration", 0.0))
        except AttributeError:  # non-h5 backends have no .f
            duration = 0.0
        if duration <= 0.0 and reader.num_events:
            sl = reader.events(reader.num_events - 1, reader.num_events)
            duration = float(sl.ts[-1])
        windows = t_seconds_windows(
            reader.search_time,
            0.0,
            duration,
            voxel_method["t"],
            voxel_method.get("sliding_window_t", 0.0),
        )
        has_frames = False
    else:
        raise ValueError(f"unknown voxel method {method!r}")
    return EventSequence(
        reader,
        windows,
        num_bins=num_bins,
        combined_voxel_channels=combined_voxel_channels,
        hot_filter=hot_filter,
        normalize=normalize,
        sensor_resolution=sensor_resolution,
        has_frames=has_frames,
        max_length=max_length,
        ev_rate=ev_rate,
        trim_last_frame=trim_last_frame,
    )


def hfr_windows(reader, k_framerate: int) -> np.ndarray:
    """High-framerate windows: each window starts at ts_frame - span/k
    (reference DynamicH5DatasetHFR, h5_dataset.py:458-483)."""
    ends = np.asarray(reader.frame_event_indices, np.int64)
    fts = np.asarray(reader.frame_timestamps, np.float64)
    starts = np.zeros_like(ends)
    start_ts = 0.0
    for i, (e, t) in enumerate(zip(ends, fts)):
        s_ts = t - (t - start_ts) / k_framerate
        starts[i] = reader.search_time(float(s_ts))
        start_ts = t
    return np.stack([starts, ends], axis=1)


class PrevoxelizedSequence:
    """Pre-voxelized NPY sequence (reference VoxelGridDataset +
    SynchronizedFramesEventsDataset, event_dataset.py:111-158,
    dataset.py:379-514): base/{event_folder}/voxels.npy (+ timestamps.txt),
    base/{frame_folder}/frames.npy + timestamps.txt. Duck-types the
    EventSequence surface the eval driver needs (voxels/frames/item_last/
    sensor_size). Frame pairing: first frame whose ts >= voxel ts."""

    item_last = None

    def __init__(
        self,
        base_folder: str,
        event_folder: str = "VoxelGrid-betweenframes-5",
        frame_folder: str = "frames",
        normalize: bool = False,
        max_length: Optional[int] = None,
    ):
        import os

        self.base = base_folder
        ef = os.path.join(base_folder, event_folder)
        ff = os.path.join(base_folder, frame_folder)
        self._voxels = np.load(os.path.join(ef, "voxels.npy"), mmap_mode="r")
        ev_ts = np.loadtxt(os.path.join(ef, "timestamps.txt"))
        self.event_ts = ev_ts[:, 1] if ev_ts.ndim == 2 else ev_ts
        self._frames = np.load(os.path.join(ff, "frames.npy"), mmap_mode="r")
        fr_ts = np.loadtxt(os.path.join(ff, "timestamps.txt"))
        self.frame_stamps = fr_ts[:, 1] if fr_ts.ndim == 2 else fr_ts
        self.normalize = normalize
        self.sensor_size = tuple(self._voxels.shape[-2:])
        self.length = len(self._voxels)
        if max_length is not None:
            self.length = min(self.length, max_length + 1)
        # first frame with ts >= voxel ts (reference dataset.py pairing)
        self.frame_idx = np.searchsorted(self.frame_stamps, self.event_ts[: self.length])
        self.frame_idx = np.clip(self.frame_idx, 0, len(self.frame_stamps) - 1)
        self.reader = self  # driver closes seq.reader

    def __len__(self):
        return self.length

    def voxels(self, start: int = 0, stop: Optional[int] = None, batch: int = 64):
        stop = self.length if stop is None else min(stop, self.length)
        v = jnp.asarray(np.asarray(self._voxels[start:stop], np.float32))
        if self.normalize:
            v = _legacy_norm_all(v)
        return v

    def frames(self, start: int = 0, stop: Optional[int] = None) -> np.ndarray:
        stop = self.length if stop is None else min(stop, self.length)
        idx = self.frame_idx[start:stop]
        out = np.asarray(self._frames[idx], np.float32)
        # the stored dtype decides uint8 scaling (out is already float32 here);
        # the max() heuristic only covers float frames saved in 0..255
        if self._frames.dtype == np.uint8 or out.max() > 1.5:
            out = out / 255.0
        return out.astype(np.float32)

    def close(self):
        pass


class H5VoxelCacheSequence:
    """Sequence backed by in-h5 precomputed voxels (the layout written by
    events.tools.h5_precompute_voxels — the reference h5_to_between_frames
    cache: ``events_voxels_{B}/event{:09d}`` datasets with ``dt`` attrs,
    read by its DynamicH5Dataset.get_event_voxel :407-409). Duck-types the
    EventSequence surface the eval driver needs."""

    item_last = None

    def __init__(
        self,
        path: str,
        num_bins: int = 5,
        normalize: bool = False,
        max_length: Optional[int] = None,
        combined_voxel_channels: bool = True,
    ):
        self.reader = H5EventReader(path)
        # combined = the reference layout; separate-polarity caches live in
        # their own group (see events.tools.h5_precompute_voxels)
        self.group = (
            f"events_voxels_{num_bins}"
            if combined_voxel_channels
            else f"events_voxels_{num_bins}_negpos"
        )
        if self.group not in self.reader.f:
            raise ValueError(
                f"{path} has no '{self.group}' cache; run "
                "events.tools.h5_precompute_voxels first"
            )
        self._grp = self.reader.f[self.group]
        self.normalize = normalize
        self.sensor_size = self.reader.sensor_size
        self.length = min(len(self._grp), max(self.reader.num_frames - 1, 0))
        if max_length is not None:
            self.length = min(self.length, max_length + 1)

    def __len__(self):
        return self.length

    def voxels(self, start: int = 0, stop: Optional[int] = None, batch: int = 64):
        stop = self.length if stop is None else min(stop, self.length)
        v = jnp.asarray(
            np.stack(
                [np.asarray(self._grp[f"event{i:09d}"]) for i in range(start, stop)]
            ).astype(np.float32)
        )
        if self.normalize:
            v = _legacy_norm_all(v)
        return v

    def frames(self, start: int = 0, stop: Optional[int] = None) -> np.ndarray:
        stop = self.length if stop is None else min(stop, self.length)
        return np.stack([self.reader.frame(i) for i in range(start, stop)])

    def frames_u8(
        self, start: int = 0, stop: Optional[int] = None
    ) -> Optional[np.ndarray]:
        """Stored uint8 frames (same contract as EventSequence.frames_u8:
        frames() == frames_u8()/255 exactly, None when not uint8-stored)."""
        stop = self.length if stop is None else min(stop, self.length)
        is_u8 = getattr(self.reader, "frame_is_u8", None)
        # first-frame metadata probe (format is per-file in practice); a
        # full-range probe doubles h5 opens on the common all-uint8 path
        if stop > start and is_u8 is not None and not is_u8(start):
            return None
        out = []
        for i in range(start, stop):
            raw = self.reader.frame_raw(i)
            if raw is None:
                return None
            out.append(raw)
        return np.stack(out) if out else None

    def close(self):
        self.reader.close()
