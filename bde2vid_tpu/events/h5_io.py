"""HDF5 event-file IO — the canonical "Monash/TimoStoff" event schema.

Schema (reference: events_contrast_maximization/tools/event_packagers.py:36-111):

    events/xs  int16[N]      events/ys  int16[N]
    events/ts  float64[N]    events/ps  bool[N]
    images/image{:09d}       uint8[H,W(,C)], attrs: size, timestamp, type, event_idx
    flow/flow{:09d}          float32[2,H,W], attrs: size, timestamp, event_idx
    file attrs: num_events num_pos num_neg duration t0 tk num_imgs num_flow
                sensor_resolution

The reader adds what the reference dataset layer computes lazily
(data_loader/h5_dataset.py:417-455): sorted frame timestamps, per-frame event
indices, binary-searched event windows.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover - h5py is baked into the image
    h5py = None


def _require_h5py():
    if h5py is None:
        raise ImportError("h5py is required for HDF5 event IO")


@dataclasses.dataclass
class EventSlice:
    xs: np.ndarray  # int32
    ys: np.ndarray  # int32
    ts: np.ndarray  # float32 (shifted so the file's t0 == 0)
    ps: np.ndarray  # float32 in {-1, +1}

    def __len__(self) -> int:
        return len(self.xs)

    @classmethod
    def from_raw(cls, xs, ys, ts, ps, t0: float = 0.0) -> "EventSlice":
        """Convert raw on-disk arrays (int16 coords, float64 absolute ts,
        bool/0-1 polarity) to framework dtypes — the single home of the
        DynamicH5Dataset convention (data_loader/h5_dataset.py:410-415):
        int32 coords, float32 ``ts - t0``, polarity remapped via ``ps*2-1``."""
        return cls(
            np.asarray(xs).astype(np.int32),
            np.asarray(ys).astype(np.int32),
            (np.asarray(ts) - t0).astype(np.float32),
            np.asarray(ps).astype(np.float32) * 2.0 - 1.0,
        )


def search_time_shifted(ts, t0: float, t: float, side: str = "left") -> int:
    """Binary search over stored ABSOLUTE timestamps for a t0-relative query,
    comparing ``(ts[mid] - t0) < t`` PER ELEMENT (reference
    binary_search_h5_dset semantics, event_utils.py:10-28). This is the ONE
    implementation every backend uses — ``searchsorted(ts, t + t0)`` is NOT
    float-equivalent (rounding of ``(a - t0)`` vs ``(t + t0)`` can disagree
    at a t_seconds window edge, putting a boundary event in different
    windows for the same recording read through different backends).
    Works on h5py datasets (chunked scalar reads), memmaps, and arrays:
    only ``len(ts)`` and ``ts[mid]`` are touched. O(log N), no copy."""
    lo, hi = 0, len(ts)
    while lo < hi:
        mid = (lo + hi) // 2
        v = ts[mid] - t0
        if (v < t) if side == "left" else (v <= t):
            lo = mid + 1
        else:
            hi = mid
    return lo


class H5EventReader:
    """Random-access reader over a canonical event h5 file.

    Mirrors DynamicH5Dataset's low-level accessors
    (data_loader/h5_dataset.py:398-455): polarity is remapped bool -> {-1,+1}
    via ``ps*2-1``, timestamps are shifted by t0, and per-frame event windows
    come from each image's ``event_idx`` attribute (or binary search when the
    attribute is missing, cf. event_utils.binary_search_h5_dset:10-28).
    """

    def __init__(self, path: str):
        _require_h5py()
        self.path = path
        self.f = h5py.File(path, "r")
        if "events/ts" not in self.f:
            raise ValueError(f"{path} is not a canonical event h5 file")
        self.t0 = float(
            self.f.attrs.get("t0", self.f["events/ts"][0] if self.num_events else 0.0)
        )
        h, w = self.f.attrs.get("sensor_resolution", (180, 240))[:2]
        self.sensor_size = (int(h), int(w))
        self._frame_keys: Optional[list] = None
        self._frame_ts: Optional[np.ndarray] = None
        self._frame_event_idx: Optional[np.ndarray] = None

    # -- events ------------------------------------------------------------

    @property
    def num_events(self) -> int:
        return int(self.f["events/ts"].shape[0])

    def raw_events(self, idx0: int, idx1: int):
        """Raw on-disk dtypes (int16, int16, float64 absolute, uint8 0/1) —
        the native packer's input format."""
        return (
            self.f["events/xs"][idx0:idx1],
            self.f["events/ys"][idx0:idx1],
            self.f["events/ts"][idx0:idx1],
            self.f["events/ps"][idx0:idx1].astype(np.uint8),
        )

    def events(self, idx0: int, idx1: int) -> EventSlice:
        """Events in [idx0, idx1), converted to framework dtypes."""
        return EventSlice.from_raw(
            self.f["events/xs"][idx0:idx1],
            self.f["events/ys"][idx0:idx1],
            self.f["events/ts"][idx0:idx1],
            self.f["events/ps"][idx0:idx1],
            self.t0,
        )

    def ts_bounds(self, idx0: int, idx1: int):
        """Raw f64 (first, last) absolute timestamps of events [idx0, idx1)
        — two scalar dataset reads, no window payload. This is how the
        reference computes window dt (h5_dataset.py:215-217,229: f64
        ``ts_k - ts_0`` BEFORE the f32 cast)."""
        if idx1 <= idx0:
            return 0.0, 0.0
        ts = self.f["events/ts"]
        return float(ts[idx0]), float(ts[idx1 - 1])

    def search_time(self, t: float, side: str = "left") -> int:
        """Binary search over the on-disk timestamp dataset (chunked reads)."""
        return search_time_shifted(self.f["events/ts"], self.t0, t, side)

    # -- frames ------------------------------------------------------------

    def _scan_frames(self):
        if self._frame_keys is not None:
            return
        keys, tss, eidx = [], [], []
        if "images" in self.f:
            for k in sorted(self.f["images"].keys()):
                d = self.f["images"][k]
                keys.append(k)
                tss.append(float(d.attrs["timestamp"]) - self.t0)
                eidx.append(int(d.attrs.get("event_idx", -1)))
        self._frame_keys = keys
        self._frame_ts = np.asarray(tss, np.float64)
        self._frame_event_idx = np.asarray(eidx, np.int64)
        if len(keys) and (self._frame_event_idx < 0).any():
            # recover missing event_idx attrs with the PACKAGER convention:
            # max(0, searchsorted_left - 1) (event_packagers.py:83-89 and
            # H5EventWriter.finalize) — a bare searchsorted would shift
            # every recovered window by one event vs attr-carrying files
            for i in np.nonzero(self._frame_event_idx < 0)[0]:
                idx = self.search_time(float(self._frame_ts[i]), side="left")
                self._frame_event_idx[i] = max(0, idx - 1)

    @property
    def num_frames(self) -> int:
        self._scan_frames()
        return len(self._frame_keys)

    @property
    def frame_timestamps(self) -> np.ndarray:
        self._scan_frames()
        return self._frame_ts

    @property
    def frame_event_indices(self) -> np.ndarray:
        self._scan_frames()
        return self._frame_event_idx

    def frame(self, i: int) -> np.ndarray:
        """Frame i as float32 grayscale in [0,1], shape (H, W)."""
        self._scan_frames()
        img = np.asarray(self.f["images"][self._frame_keys[i]])
        if img.ndim == 3:
            if img.shape[-1] == 3:  # reference stores BGR
                img = (
                    0.114 * img[..., 0] + 0.587 * img[..., 1] + 0.299 * img[..., 2]
                )
            else:
                img = img[..., 0]
        return (img / 255.0).astype(np.float32)

    def frame_raw(self, i: int) -> Optional[np.ndarray]:
        """Frame i exactly as stored, when single-channel uint8 — then
        ``frame(i) == frame_raw(i) / 255`` bit-exactly, so callers can ship
        the uint8 bytes to the device (4x less transfer) and scale there.
        Returns None for BGR/float-stored frames (callers fall back to
        :meth:`frame`)."""
        self._scan_frames()
        img = self.f["images"][self._frame_keys[i]]
        if img.ndim == 2 and img.dtype == np.uint8:
            return np.asarray(img)
        return None

    def frame_is_u8(self, i: int) -> bool:
        """Metadata-only probe (no pixel read): would frame_raw(i) succeed?
        Lets batch callers decide the uint8 fast path without reading
        frames they would then discard."""
        self._scan_frames()
        img = self.f["images"][self._frame_keys[i]]
        return img.ndim == 2 and img.dtype == np.uint8

    # -- flow --------------------------------------------------------------

    @property
    def num_flow(self) -> int:
        return len(self.f["flow"]) if "flow" in self.f else 0

    def flow(self, i: int) -> np.ndarray:
        keys = sorted(self.f["flow"].keys())
        return np.asarray(self.f["flow"][keys[i]], np.float32)

    def close(self):
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class H5EventWriter:
    """Write the canonical event h5 schema (parity with hdf5_packager).

    Reference: event_packagers.py:36-111. Events append in chunks; images and
    flow are individual datasets with timestamp attrs; ``finalize`` writes the
    file attrs and per-frame ``event_idx`` — searchsorted-LEFT minus 1,
    clamped to >= 0: the last event strictly BEFORE the frame timestamp (an
    event exactly simultaneous with the frame is excluded — the reference
    packager's convention, :75-89).
    """

    def __init__(self, path: str, sensor_size: Tuple[int, int] = (180, 240)):
        _require_h5py()
        self.f = h5py.File(path, "w")
        self.sensor_size = sensor_size
        kw = dict(maxshape=(None,), chunks=True)
        self.dx = self.f.create_dataset("events/xs", (0,), dtype=np.int16, **kw)
        self.dy = self.f.create_dataset("events/ys", (0,), dtype=np.int16, **kw)
        self.dt = self.f.create_dataset("events/ts", (0,), dtype=np.float64, **kw)
        self.dp = self.f.create_dataset("events/ps", (0,), dtype=np.bool_, **kw)
        self.num_pos = 0
        self.num_neg = 0
        self.num_imgs = 0
        self.num_flow = 0

    def append_events(self, xs, ys, ts, ps):
        """ps may be bool (True=pos) or +-1; stored as bool."""
        ps = np.asarray(ps)
        ps_bool = ps > 0 if ps.dtype != np.bool_ else ps
        for dset, data in ((self.dx, xs), (self.dy, ys), (self.dt, ts), (self.dp, ps_bool)):
            data = np.asarray(data)
            dset.resize(dset.shape[0] + len(data), axis=0)
            if len(data):
                dset[-len(data):] = data
        self.num_pos += int(np.count_nonzero(ps_bool))
        self.num_neg += int(len(ps_bool) - np.count_nonzero(ps_bool))

    def add_image(self, image: np.ndarray, timestamp: float):
        d = self.f.create_dataset(
            f"images/image{self.num_imgs:09d}", data=image.astype(np.uint8)
        )
        d.attrs["size"] = image.shape
        d.attrs["timestamp"] = timestamp
        d.attrs["type"] = (
            "greyscale" if image.ndim == 2 or image.shape[-1] == 1 else "color_bgr"
        )
        self.num_imgs += 1

    def add_flow(self, flow: np.ndarray, timestamp: float):
        d = self.f.create_dataset(
            f"flow/flow{self.num_flow:09d}", data=flow.astype(np.float32)
        )
        d.attrs["size"] = flow.shape
        d.attrs["timestamp"] = timestamp
        self.num_flow += 1

    def finalize(self):
        ts = self.dt[:]
        t0 = float(ts[0]) if len(ts) else 0.0
        tk = float(ts[-1]) if len(ts) else 0.0
        a = self.f.attrs
        a["num_events"] = self.num_pos + self.num_neg
        a["num_pos"] = self.num_pos
        a["num_neg"] = self.num_neg
        a["duration"] = tk - t0
        a["t0"] = t0
        a["tk"] = tk
        a["num_imgs"] = self.num_imgs
        a["num_flow"] = self.num_flow
        a["sensor_resolution"] = self.sensor_size
        for group in ("images", "flow"):
            if group in self.f:
                for key in self.f[group]:
                    img_ts = self.f[group][key].attrs["timestamp"]
                    idx = int(np.searchsorted(ts, img_ts))
                    self.f[group][key].attrs["event_idx"] = max(0, idx - 1)
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            # the with-body raised: close WITHOUT finalize. Writing the
            # complete-looking file attrs over partial data would make a
            # truncated conversion indistinguishable from a successful one
            # (and a finalize failure would mask the original error)
            self.f.close()
            return
        self.finalize()
