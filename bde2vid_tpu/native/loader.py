"""Build + load the native event kernels (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "evpack.cc")


def _build_dir() -> str:
    d = os.environ.get(
        "BDE2VID_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "bde2vid_tpu"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def get_lib() -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed) and load the shared library; None if no
    toolchain is available."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            with open(_SRC, "rb") as fp:
                tag = hashlib.sha256(fp.read()).hexdigest()[:16]
            so_path = os.path.join(_build_dir(), f"evpack_{tag}.so")
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
            i64, i32p = ctypes.c_int64, np.ctypeslib.ndpointer
            lib.pack_windows.restype = ctypes.c_int
            lib.pack_windows.argtypes = [
                i32p(np.int16, flags="C"),
                i32p(np.int16, flags="C"),
                i32p(np.float64, flags="C"),
                i32p(np.uint8, flags="C"),
                i32p(np.int64, flags="C"),
                i64,
                i64,
                i32p(np.int16, flags="C"),
                i32p(np.int16, flags="C"),
                i32p(np.float32, flags="C"),
                i32p(np.int8, flags="C"),
                i32p(np.int32, flags="C"),
            ]
            lib.voxelize_batch.restype = None
            lib.voxelize_batch.argtypes = [
                i32p(np.int16, flags="C"),
                i32p(np.int16, flags="C"),
                i32p(np.float32, flags="C"),
                i32p(np.int8, flags="C"),
                i32p(np.int32, flags="C"),
                i64,
                i64,
                i64,
                i64,
                i64,
                i32p(np.float32, flags="C"),
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def native_available() -> bool:
    return get_lib() is not None


def pack_windows(
    xs: np.ndarray,  # int16 (N,)
    ys: np.ndarray,
    ts: np.ndarray,  # float64 absolute
    ps: np.ndarray,  # uint8/bool 0/1
    windows: np.ndarray,  # int64 (n, 2)
    capacity: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pack event windows into padded (n, capacity) batch buffers.

    Returns (xs_i16, ys_i16, ts_f32_shifted, ps_pm1_i8, n_i32) — compact
    dtypes (9 B/event vs 16) because the buffers cross the ~100 MB/s
    host->TPU tunnel, which is 83% of the measured voxelize phase; the
    device voxelizer upcasts on chip. Uses the native kernel when
    available, NumPy otherwise (identical output)."""
    windows = np.ascontiguousarray(windows, np.int64)
    n_windows = len(windows)
    # validate BEFORE crossing the C boundary: the kernel indexes the raw
    # stream with these values and cannot bounds-check it
    if len(xs) != len(ys) or len(xs) != len(ts) or len(xs) != len(ps):
        raise ValueError("event component arrays differ in length")
    if n_windows:
        if windows.min() < 0 or windows.max() > len(xs):
            raise ValueError(
                f"window indices out of range [0, {len(xs)}]: "
                f"[{windows.min()}, {windows.max()}]"
            )
        if (windows[:, 1] < windows[:, 0]).any():
            raise ValueError("window end precedes start")
    oxs = np.empty((n_windows, capacity), np.int16)
    oys = np.empty((n_windows, capacity), np.int16)
    ots = np.empty((n_windows, capacity), np.float32)
    ops = np.empty((n_windows, capacity), np.int8)
    ons = np.empty((n_windows,), np.int32)

    lib = get_lib()
    if lib is not None:
        xs = np.ascontiguousarray(xs, np.int16)
        ys = np.ascontiguousarray(ys, np.int16)
        ts = np.ascontiguousarray(ts, np.float64)
        ps = np.ascontiguousarray(ps, np.uint8)
        rc = lib.pack_windows(
            xs, ys, ts, ps, windows, n_windows, capacity, oxs, oys, ots, ops, ons
        )
        if rc != 0:
            raise ValueError("window larger than capacity")
        return oxs, oys, ots, ops, ons

    # NumPy fallback
    for w, (i0, i1) in enumerate(windows):
        n = int(i1 - i0)
        if n > capacity:
            raise ValueError("window larger than capacity")
        oxs[w, :n] = xs[i0:i1]
        oys[w, :n] = ys[i0:i1]
        tw = ts[i0:i1]
        t0 = tw[0] if n else 0.0
        ots[w, :n] = (tw - t0).astype(np.float32)
        ops[w, :n] = np.where(np.asarray(ps[i0:i1]) > 0, 1, -1)
        fill = ots[w, n - 1] if n else 0.0
        oxs[w, n:] = 0
        oys[w, n:] = 0
        ots[w, n:] = fill
        ops[w, n:] = 0
        ons[w] = n
    return oxs, oys, ots, ops, ons


def voxelize_batch_native(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    ns: np.ndarray,
    num_bins: int,
    sensor_size: Tuple[int, int],
) -> Optional[np.ndarray]:
    """Batch CPU voxelization; None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n_windows, capacity = xs.shape
    ns = np.asarray(ns)
    if len(ns) != n_windows or (ns > capacity).any() or (ns < 0).any():
        raise ValueError("ns out of range for the packed buffers")
    h, w = sensor_size
    out = np.empty((n_windows, num_bins, h, w), np.float32)
    lib.voxelize_batch(
        np.ascontiguousarray(xs, np.int16),
        np.ascontiguousarray(ys, np.int16),
        np.ascontiguousarray(ts, np.float32),
        np.ascontiguousarray(ps, np.int8),
        np.ascontiguousarray(ns, np.int32),
        n_windows,
        capacity,
        num_bins,
        h,
        w,
        out,
    )
    return out
