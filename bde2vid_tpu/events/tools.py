"""Event-data conversion tools (reference: events_contrast_maximization/tools/).

- txt/csv -> h5        (txt_to_h5.py:23-90)
- h5 slice (cut)       (h5_cut.py:21+)
- h5 attribute patch   (add_hdf5_attribute.py:28+)
- h5 <-> memmap        (h5_to_memmap.py, read_events.py:12+)
- rosbag -> h5 lives in events/rosbag.py (self-contained bag parser +
  packaging core; no ROS toolchain needed).

All converters emit the canonical schema via H5EventWriter.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from bde2vid_tpu.events.h5_io import (
    H5EventReader,
    H5EventWriter,
    search_time_shifted as _search_time_shifted,
)


def txt_to_h5(
    txt_path: str,
    output_path: str,
    zero_timestamps: bool = False,
    sensor_size: Optional[Tuple[int, int]] = None,
    chunksize: int = 100_000,
) -> None:
    """Convert a whitespace text event stream ``t x y pol`` (one header line)
    to the canonical h5 format, streaming in chunks."""
    if sensor_size is None:
        with open(txt_path) as fp:
            header = fp.readline().split()
        if len(header) == 2:  # first line is "W H" in the DVS txt convention
            sensor_size = (int(header[1]), int(header[0]))
    first_ts = None
    with H5EventWriter(output_path, sensor_size=sensor_size or (180, 240)) as w:
        max_x = max_y = 0
        with open(txt_path) as fp:
            fp.readline()  # header
            done = False
            while not done:
                ts, xs, ys, ps = [], [], [], []
                for _ in range(chunksize):
                    line = fp.readline()
                    if not line:
                        done = True
                        break
                    t, x, y, p = line.split()
                    ts.append(float(t))
                    xs.append(int(x))
                    ys.append(int(y))
                    ps.append(int(p) > 0)
                if not ts:
                    break
                ts = np.asarray(ts, np.float64)
                if first_ts is None:
                    first_ts = ts[0]
                if zero_timestamps:
                    ts = ts - first_ts
                xs = np.asarray(xs, np.int16)
                ys = np.asarray(ys, np.int16)
                max_x = max(max_x, int(xs.max()))
                max_y = max(max_y, int(ys.max()))
                w.append_events(xs, ys, ts, np.asarray(ps))
        if sensor_size is None:
            w.sensor_size = (max_y + 1, max_x + 1)


def zip_to_h5(
    zip_path: str,
    output_path: str,
    zero_timestamps: bool = False,
    sensor_size: Optional[Tuple[int, int]] = None,
) -> None:
    """Convert a zip of frames + an events text stream to the canonical h5
    format (reference zip_to_h5.py:26+): the archive holds 'frame*' image
    files, an 'images.txt' (t, filename) listing, and an 'events*' text
    stream of ``t x y pol`` lines."""
    import zipfile

    zf = zipfile.ZipFile(zip_path, "r")
    names = zf.namelist()
    imgfiles = sorted(n for n in names if "frame" in n)
    evtfile = next((n for n in names if "events" in n), None)
    imgtsfile = next((n for n in names if "images.txt" in n), None)
    if evtfile is None:
        raise ValueError("zip contains no events file")

    first_ts = None
    sensor_known = sensor_size is not None
    with H5EventWriter(output_path, sensor_size=sensor_size or (180, 240)) as w:
        if imgtsfile is not None:
            lines = zf.read(imgtsfile).decode().strip().splitlines()
            for i, line in enumerate(lines[: len(imgfiles)]):
                ts = float(line.split()[0])
                if first_ts is None:
                    first_ts = ts
                if zero_timestamps:
                    ts -= first_ts
                img = _decode_gray_image(zf.read(imgfiles[i]))
                w.add_image(img, ts)
                if sensor_size is None:
                    w.sensor_size = img.shape[:2]
                    sensor_known = True
        # the reference resets first_ts before the event loop
        # (zip_to_h5.py:70-71): events zero by the FIRST EVENT timestamp,
        # independently of the image stream (and regardless of whether an
        # images.txt exists)
        ev_first_ts = None
        max_x = max_y = 0
        ts_l, xs_l, ys_l, ps_l = [], [], [], []
        for raw in zf.read(evtfile).decode().strip().splitlines():
            t, x, y, pol = raw.split()
            if ev_first_ts is None:
                ev_first_ts = float(t)
            ts_l.append(float(t))
            xs_l.append(int(x))
            ys_l.append(int(y))
            ps_l.append(int(pol) > 0)
            if len(ts_l) >= 100_000:
                max_x = max(max_x, max(xs_l))
                max_y = max(max_y, max(ys_l))
                _flush_events(w, ts_l, xs_l, ys_l, ps_l, ev_first_ts, zero_timestamps)
                ts_l, xs_l, ys_l, ps_l = [], [], [], []
        if ts_l:
            max_x = max(max_x, max(xs_l))
            max_y = max(max_y, max(ys_l))
            _flush_events(w, ts_l, xs_l, ys_l, ps_l, ev_first_ts, zero_timestamps)
        if not sensor_known:
            # events-only zip (no decodable frames): infer the sensor from
            # the event extents like txt_to_h5 — the (180,240) placeholder
            # would silently mask every event beyond it downstream
            w.sensor_size = (max_y + 1, max_x + 1)


def _flush_events(w, ts_l, xs_l, ys_l, ps_l, first_ts, zero_timestamps):
    ts = np.asarray(ts_l, np.float64)
    if zero_timestamps and first_ts is not None:
        ts = ts - first_ts
    w.append_events(
        np.asarray(xs_l, np.int16), np.asarray(ys_l, np.int16), ts, np.asarray(ps_l)
    )


def _decode_gray_image(data: bytes) -> np.ndarray:
    """Decode an image to grayscale uint8; OpenCV if present, else PIL.
    cv2.imdecode signals failure by returning None (not raising), so an
    undecodable payload falls through to PIL instead of handing None to
    the caller."""
    try:
        import cv2

        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)
        if img is not None:
            return img
    except ImportError:
        pass
    try:
        from PIL import Image
        import io

        return np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    except ImportError as err:
        raise ImportError("no image decoder available (cv2/PIL)") from err


def h5_cut(
    input_path: str, output_path: str, t_start: float, t_end: float
) -> None:
    """Slice an h5 sequence to [t_start, t_end) seconds (relative to t0),
    keeping the frames in range. Flow is NOT copied — parity with the
    reference h5_cut.py, which also writes the cut file with num_flow=0."""
    with H5EventReader(input_path) as r:
        i0 = r.search_time(t_start)
        i1 = r.search_time(t_end)
        # raw_events: lossless float64 absolute timestamps — round-tripping
        # through EventSlice's float32 relative ts would quantize late-file
        # timestamps to ~60 us at t=1000 s (the reference copies the float64
        # dataset directly)
        rxs, rys, rts, rps = r.raw_events(i0, i1)
        with H5EventWriter(output_path, sensor_size=r.sensor_size) as w:
            w.append_events(rxs, rys, rts, rps > 0)
            if r.num_frames:
                fts = r.frame_timestamps
                for i in np.nonzero((fts >= t_start) & (fts < t_end))[0]:
                    img = np.asarray(r.f["images"][r._frame_keys[int(i)]])
                    w.add_image(img, float(fts[int(i)]) + r.t0)


def add_hdf5_attribute(path: str, attr: str, value, dataset: Optional[str] = None):
    """Patch an attribute on the file (or a dataset) in place
    (reference add_hdf5_attribute.py:28+)."""
    import h5py

    with h5py.File(path, "a") as f:
        target = f[dataset] if dataset else f
        target.attrs[attr] = value


# ------------------------------- memmap --------------------------------------

MEMMAP_FILES = ("t.npy", "xy.npy", "p.npy", "images.npy", "timestamps.npy")


def h5_to_memmap(h5_path: str, out_dir: str) -> None:
    """Export the canonical h5 format to the RPG memmap layout:
    t.npy (N,), xy.npy (N,2), p.npy (N,), images.npy (F,H,W,1),
    timestamps.npy (F,), index.npy (F,), dataset_config.json."""
    os.makedirs(out_dir, exist_ok=True)
    with H5EventReader(h5_path) as r:
        # raw dtypes: float64 absolute ts kept lossless (float32 relative ts
        # would quantize microsecond timing late in long recordings).
        # Copy CHUNK-WISE into pre-sized memmaps: materializing the whole
        # stream (~13 B/event) needs >10 GB transient RAM on long
        # recordings, for a purely sequential copy
        n = r.num_events
        t_out = np.lib.format.open_memmap(
            os.path.join(out_dir, "t.npy"), mode="w+", dtype=np.float64, shape=(n,)
        )
        xy_out = np.lib.format.open_memmap(
            os.path.join(out_dir, "xy.npy"), mode="w+", dtype=np.int16, shape=(n, 2)
        )
        p_out = np.lib.format.open_memmap(
            os.path.join(out_dir, "p.npy"), mode="w+", dtype=np.uint8, shape=(n,)
        )
        chunk = 1 << 22  # ~4M events (~60 MB working set)
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            rxs, rys, rts, rps = r.raw_events(i0, i1)
            t_out[i0:i1] = rts
            xy_out[i0:i1, 0] = rxs
            xy_out[i0:i1, 1] = rys
            p_out[i0:i1] = rps > 0
        del t_out, xy_out, p_out  # flush the memmaps
        if r.num_frames:
            imgs = np.stack(
                [np.asarray(r.f["images"][k]) for k in r._frame_keys]
            )
            if imgs.ndim == 3:
                imgs = imgs[..., None]
            np.save(os.path.join(out_dir, "images.npy"), imgs)
            np.save(
                os.path.join(out_dir, "timestamps.npy"),
                r.frame_timestamps + r.t0,
            )
            np.save(os.path.join(out_dir, "index.npy"), r.frame_event_indices)
        with open(os.path.join(out_dir, "dataset_config.json"), "w") as fp:
            json.dump(
                {
                    "data_source": "unknown",
                    "sensor_resolution": list(r.sensor_size),
                    "num_events": int(r.num_events),
                },
                fp,
            )


class NPYEventReader:
    """Raw-NPY event layout reader (reference SynchronizedNPYDataset,
    data_loader/dataset.py:207-376): base/{event_folder}/{xs,ys,ts,ps}.npy,
    base/{frame_folder}/frames.npy + frame_ts.txt + frame_event_idxes.txt."""

    def __init__(self, path: str, event_folder: str = "events", frame_folder: str = "frames"):
        self.path = path
        ef = os.path.join(path, event_folder)
        ff = os.path.join(path, frame_folder)
        self.xs = np.load(os.path.join(ef, "xs.npy"), mmap_mode="r")
        self.ys = np.load(os.path.join(ef, "ys.npy"), mmap_mode="r")
        self.t = np.load(os.path.join(ef, "ts.npy"), mmap_mode="r")
        self.p = np.load(os.path.join(ef, "ps.npy"), mmap_mode="r")
        self.images = np.load(os.path.join(ff, "frames.npy"), mmap_mode="r")
        self.frame_ts = np.loadtxt(os.path.join(ff, "frame_ts.txt")).reshape(-1)
        self._event_idxes = np.loadtxt(
            os.path.join(ff, "frame_event_idxes.txt"), dtype=np.int64
        ).reshape(-1, 2)
        # frames.npy is (F, H, W) or (F, H, W, C) — shape[-2:] would give
        # (W, C) for channeled frames
        self.sensor_size = tuple(self.images.shape[1:3])
        self.t0 = float(self.t[0]) if len(self.t) else 0.0

    @property
    def num_events(self) -> int:
        return len(self.t)

    @property
    def num_frames(self) -> int:
        return len(self.frame_ts)

    @property
    def frame_timestamps(self) -> np.ndarray:
        return np.asarray(self.frame_ts, np.float64) - self.t0

    @property
    def frame_event_indices(self) -> np.ndarray:
        # window ends; the pipeline re-derives [start, end) pairs
        return self._event_idxes[:, 1]

    @property
    def frame_windows(self) -> np.ndarray:
        """Explicit per-frame [idx0, idx1) pairs (this layout stores both)."""
        return self._event_idxes

    @property
    def num_flow(self) -> int:
        return 0

    def raw_events(self, i0: int, i1: int):
        return (
            np.asarray(self.xs[i0:i1], np.int16),
            np.asarray(self.ys[i0:i1], np.int16),
            np.asarray(self.t[i0:i1], np.float64),
            np.asarray(self.p[i0:i1], np.uint8),
        )

    def events(self, i0: int, i1: int):
        from bde2vid_tpu.events.h5_io import EventSlice

        # from_raw converts polarities AFTER the float cast: the reference
        # computes ps*2-1 on the raw dtype, which wraps to +255 for
        # uint8-stored zeros (dataset.py:307) — a storage-dtype hazard
        return EventSlice.from_raw(
            self.xs[i0:i1], self.ys[i0:i1], self.t[i0:i1], self.p[i0:i1],
            self.t0,
        )

    def search_time(self, t: float, side: str = "left") -> int:
        # per-element (ts[mid] - t0) < t comparison, matching the H5 reader
        # bit-for-bit (materializing `self.t - t0` would copy the whole
        # stream on EVERY call — one per window in t_seconds/HFR windowing)
        return _search_time_shifted(self.t, self.t0, t, side)

    def ts_bounds(self, i0: int, i1: int):
        """Raw f64 (first, last) absolute timestamps of events [i0, i1) —
        the reference's window-dt inputs (h5_dataset.py:215-217,229: f64
        ts_k - ts_0, computed BEFORE the f32 cast) without reading the
        window's event payload."""
        if i1 <= i0:
            return 0.0, 0.0
        return float(self.t[i0]), float(self.t[i1 - 1])

    def frame(self, i: int) -> np.ndarray:
        img = np.asarray(self.images[i])
        if img.ndim == 3:
            img = img[..., 0]
        if img.dtype == np.uint8:
            img = img / 255.0
        return img.astype(np.float32)

    def flow(self, i: int):
        raise IndexError("raw-NPY dataset has no flow")

    def close(self):
        pass


class MemMapEventReader:
    """Random-access reader over the RPG memmap layout, matching the
    H5EventReader surface (reference MemMapDataset, h5_dataset.py:568-665)."""

    def __init__(self, path: str):
        if not os.path.isdir(path):
            raise ValueError(f"{path} is not a memmap directory")
        self.path = path
        # reshape, not squeeze: RPG files store (N,1)/(N,1,2)-shaped arrays,
        # but an unconditional squeeze corrupts N==1 files ((1,2) xy ->
        # (2,), (1,) t -> 0-d, breaking len()/column indexing)
        self.t = np.load(os.path.join(path, "t.npy"), mmap_mode="r").reshape(-1)
        self.xy = np.load(os.path.join(path, "xy.npy"), mmap_mode="r").reshape(-1, 2)
        self.p = np.load(os.path.join(path, "p.npy"), mmap_mode="r").reshape(-1)
        img_path = os.path.join(path, "images.npy")
        self.images = np.load(img_path, mmap_mode="r") if os.path.exists(img_path) else None
        ts_path = os.path.join(path, "timestamps.npy")
        self.frame_ts = np.load(ts_path) if os.path.exists(ts_path) else np.zeros(0)
        cfg_path = os.path.join(path, "dataset_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as fp:
                cfg = json.load(fp)
            self.sensor_size = tuple(cfg["sensor_resolution"])[:2]
        elif self.images is not None and len(self.images):
            self.sensor_size = tuple(self.images[0].shape[:2])
        else:
            self.sensor_size = (int(self.xy[:, 1].max()) + 1, int(self.xy[:, 0].max()) + 1)
        self.t0 = float(self.t[0]) if len(self.t) else 0.0

    @property
    def num_events(self) -> int:
        return len(self.t)

    @property
    def num_frames(self) -> int:
        return len(self.frame_ts)

    @property
    def frame_timestamps(self) -> np.ndarray:
        return np.asarray(self.frame_ts, np.float64) - self.t0

    @property
    def frame_event_indices(self) -> np.ndarray:
        # the reference MemMapDataset never reads index.npy — it derives
        # window ends by searchsorting the frame timestamps
        # (compute_frame_indices -> find_ts_index, h5_dataset.py:645-647);
        # index.npy (h5 event_idx convention, searchsorted-1) stays
        # informational in the export
        return np.searchsorted(np.asarray(self.t), np.asarray(self.frame_ts))

    @property
    def num_flow(self) -> int:
        return 0

    def raw_events(self, i0: int, i1: int):
        xy = np.asarray(self.xy[i0:i1])
        return (
            xy[:, 0].astype(np.int16),
            xy[:, 1].astype(np.int16),
            np.asarray(self.t[i0:i1], np.float64),
            np.asarray(self.p[i0:i1], np.uint8),
        )

    def events(self, i0: int, i1: int):
        from bde2vid_tpu.events.h5_io import EventSlice

        xy = np.asarray(self.xy[i0:i1])
        return EventSlice.from_raw(
            xy[:, 0], xy[:, 1], self.t[i0:i1], self.p[i0:i1], self.t0
        )

    def search_time(self, t: float, side: str = "left") -> int:
        # copy-free binary search over the memmap, same per-element
        # arithmetic as the H5 reader (see _search_time_shifted)
        return _search_time_shifted(self.t, self.t0, t, side)

    def ts_bounds(self, i0: int, i1: int):
        """Raw f64 (first, last) absolute event timestamps (see
        NPYEventReader.ts_bounds)."""
        if i1 <= i0:
            return 0.0, 0.0
        return float(self.t[i0]), float(self.t[i1 - 1])

    def frame(self, i: int) -> np.ndarray:
        img = np.asarray(self.images[i])
        if img.ndim == 3:
            img = img[..., 0]
        return (img / 255.0).astype(np.float32)

    def flow(self, i: int):
        raise IndexError("memmap dataset has no flow")

    def close(self):
        pass


# --------------------- between-frames voxel precompute -----------------------


def _between_frames_voxel(sl, num_bins: int, sensor_size, combined: bool):
    """One window -> (C, H, W) float32 voxel + dt, reference item semantics
    (h5_to_between_frames.py make_event_voxel :110-130: <3 events -> zeros,
    timestamps shifted to the window start, combined or pos/neg-concat)."""
    from bde2vid_tpu.events.voxel_np import (
        events_to_neg_pos_voxel_np,
        events_to_voxel_np,
    )

    channels = num_bins if combined else 2 * num_bins
    if len(sl.xs) < 3:
        return np.zeros((channels, *sensor_size), np.float32), 0.0
    ts = sl.ts - sl.ts[0]
    dt = float(ts[-1])
    if combined:
        vox = events_to_voxel_np(sl.xs, sl.ys, ts, sl.ps, num_bins, sensor_size)
    else:
        vp, vn = events_to_neg_pos_voxel_np(sl.xs, sl.ys, ts, sl.ps, num_bins, sensor_size)
        vox = np.concatenate([vp, vn], axis=0)
    return vox.astype(np.float32), dt


def h5_precompute_voxels(
    path: str,
    num_bins: int = 5,
    combined_voxel_channels: bool = True,
    overwrite: bool = False,
) -> int:
    """Cache between-frames voxel grids INSIDE the h5 file.

    This is the reference ``h5_to_between_frames`` tool's (intended) on-disk
    format: per-interval datasets ``events_voxels_{B}/event{:09d}`` with a
    ``dt`` attribute, read back by its DynamicH5Dataset.get_event_voxel
    (h5_to_between_frames.py:407-409). NOTE the reference file as shipped is
    bitrotted — it calls self.make_event_voxels() (:176) which is defined
    nowhere — so this implements the format its reader consumes. Existing
    datasets are skipped (:111-113) unless ``overwrite``.

    Returns the number of voxels written.
    """
    import h5py

    from bde2vid_tpu.data.windowing import between_frames_windows

    from bde2vid_tpu.events.h5_io import EventSlice

    written = 0
    with H5EventReader(path) as r:
        windows = between_frames_windows(r.frame_event_indices)
        length = max(r.num_frames - 1, 0)  # reference __len__ (:306-307)
        sensor = r.sensor_size
        t0 = r.t0
    if length == 0:
        return 0
    # ONE r+ handle for both reads and writes: events stream one window at a
    # time at write time (buffering every todo window's EventSlice up front
    # would hold the whole recording's events in RAM), and a rerun on a
    # cached file is a cheap no-op
    with h5py.File(path, "r+") as f:
        # combined voxels use the reference layout (events_voxels_{B});
        # separate-polarity grids are an extension the reference never
        # caches — a distinct group name, otherwise a rerun with the other
        # polarity mode would see every dataset present, write nothing,
        # and silently serve wrong-channel voxels
        group_name = (
            f"events_voxels_{num_bins}"
            if combined_voxel_channels
            else f"events_voxels_{num_bins}_negpos"
        )
        grp = f.require_group(group_name)
        existing = set(grp)
        todo = [
            i for i in range(length)
            if overwrite or f"event{i:09d}" not in existing
        ]
        xs_d, ys_d = f["events/xs"], f["events/ys"]
        ts_d, ps_d = f["events/ts"], f["events/ps"]
        for i in todo:
            i0, i1 = int(windows[i][0]), int(windows[i][1])
            sl = EventSlice.from_raw(
                xs_d[i0:i1], ys_d[i0:i1], ts_d[i0:i1], ps_d[i0:i1], t0
            )
            vox, dt = _between_frames_voxel(
                sl, num_bins, sensor, combined_voxel_channels
            )
            name = f"event{i:09d}"
            if name in grp:
                del grp[name]
            d = grp.create_dataset(name, data=vox)
            d.attrs["dt"] = dt
            written += 1
    return written


def h5_to_prevoxelized_npy(
    h5_path: str,
    out_dir: str,
    num_bins: int = 5,
    combined_voxel_channels: bool = True,
    event_folder: Optional[str] = None,
    frame_folder: str = "frames",
) -> None:
    """Export an h5 sequence to the pre-voxelized NPY tree consumed by
    PrevoxelizedSequence (reference VoxelGridDataset layout,
    event_dataset.py:111-158):

        out/{VoxelGrid-betweenframes-B}/voxels.npy   (L, C, H, W) float32
        out/{...}/timestamps.txt                     "idx ts" per voxel
        out/frames/frames.npy                        (F, H, W) uint8
        out/frames/timestamps.txt                    "idx ts" per frame

    Voxel i covers the events before frame i; its timestamp is frame i's,
    so the first-frame-at-or-after-ts pairing reproduces the h5 item pairing.
    """
    event_folder = event_folder or f"VoxelGrid-betweenframes-{num_bins}"
    ef = os.path.join(out_dir, event_folder)
    ff = os.path.join(out_dir, frame_folder)
    os.makedirs(ef, exist_ok=True)
    os.makedirs(ff, exist_ok=True)
    with H5EventReader(h5_path) as r:
        from bde2vid_tpu.data.windowing import between_frames_windows

        windows = between_frames_windows(r.frame_event_indices)
        length = max(r.num_frames - 1, 0)
        voxels = []
        for i in range(length):
            idx0, idx1 = (int(v) for v in windows[i])
            vox, _ = _between_frames_voxel(
                r.events(idx0, idx1), num_bins, r.sensor_size,
                combined_voxel_channels,
            )
            voxels.append(vox)
        fts = r.frame_timestamps + r.t0  # absolute, like the source files
        if r.num_frames == 0:
            raise ValueError(
                f"{h5_path} has no frames — the pre-voxelized NPY layout "
                "pairs every voxel with a frame"
            )
        # grayscale via the reader (handles the reference's BGR storage);
        # saving raw (F, H, W, 3) would break the (T, H, W) frame surface
        frames = np.stack(
            [np.rint(r.frame(i) * 255.0).astype(np.uint8)
             for i in range(r.num_frames)]  # rint: /255*255 must round-trip
        )
    channels = num_bins if combined_voxel_channels else 2 * num_bins
    np.save(os.path.join(ef, "voxels.npy"), np.stack(voxels) if voxels else
            np.zeros((0, channels, *frames.shape[-2:]), np.float32))
    with open(os.path.join(ef, "timestamps.txt"), "w") as fp:
        for i in range(length):
            fp.write(f"{i} {fts[i]:.9f}\n")
    np.save(os.path.join(ff, "frames.npy"), frames)
    with open(os.path.join(ff, "timestamps.txt"), "w") as fp:
        for i, t in enumerate(fts):
            fp.write(f"{i} {t:.9f}\n")
