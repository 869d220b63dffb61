"""Native C++ event kernel tests: parity with the NumPy/JAX paths."""

import numpy as np
import pytest

from bde2vid_tpu.events.voxel_np import events_to_voxel_np
from bde2vid_tpu.native import (
    native_available,
    pack_windows,
    voxelize_batch_native,
)
from tests.conftest import make_events

SENSOR = (48, 64)

needs_native = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


def _stream(rng, n=6000):
    xs, ys, ts, ps = make_events(rng, n=n, sensor_size=SENSOR, t1=1.0)
    return (
        xs.astype(np.int16),
        ys.astype(np.int16),
        (ts.astype(np.float64) + 5.0),
        (ps > 0).astype(np.uint8),
    )


def test_native_builds():
    assert native_available(), "g++ is baked into this image; build must work"


def test_pack_windows_matches_numpy_fallback(rng):
    xs, ys, ts, ps = _stream(rng)
    windows = np.array([[0, 1000], [1000, 3500], [3500, 3500], [3500, 6000]], np.int64)
    cap = 4096
    native = pack_windows(xs, ys, ts, ps, windows, cap)

    # force the numpy fallback by computing it inline
    import bde2vid_tpu.native.loader as L

    lib = L._LIB
    L._LIB, L._TRIED = None, True
    try:
        fallback = pack_windows(xs, ys, ts, ps, windows, cap)
    finally:
        L._LIB, L._TRIED = lib, True

    for a, b in zip(native, fallback):
        np.testing.assert_allclose(a, b, atol=1e-6)
    oxs, oys, ots, ops, ons = native
    assert list(ons) == [1000, 2500, 0, 2500]
    assert ots[1, 0] == 0.0  # shifted to window start
    assert (ops[0, :1000] != 0).all() and (ops[0, 1000:] == 0).all()


@needs_native
def test_native_voxelize_matches_oracle(rng):
    xs, ys, ts, ps = _stream(rng, n=4000)
    windows = np.array([[0, 2000], [2000, 4000]], np.int64)
    oxs, oys, ots, ops, ons = pack_windows(xs, ys, ts, ps, windows, 2048)
    got = voxelize_batch_native(oxs, oys, ots, ops, ons, 5, SENSOR)
    for w, (i0, i1) in enumerate(windows):
        want = events_to_voxel_np(
            xs[i0:i1].astype(np.int64),
            ys[i0:i1].astype(np.int64),
            ts[i0:i1] - ts[i0],
            np.where(ps[i0:i1] > 0, 1.0, -1.0),
            5,
            SENSOR,
        )
        np.testing.assert_allclose(got[w], want, atol=1e-3, rtol=1e-3)


@needs_native
def test_native_voxelize_small_window_zero(rng):
    xs, ys, ts, ps = _stream(rng, n=100)
    windows = np.array([[0, 2]], np.int64)  # < 3 events
    packed = pack_windows(xs, ys, ts, ps, windows, 64)
    got = voxelize_batch_native(*packed, 5, SENSOR)
    assert got.sum() == 0.0


def test_pack_windows_rejects_out_of_range(rng):
    """Bounds are validated BEFORE crossing the C boundary — the kernel
    indexes the raw stream with the window values and cannot check them."""
    from bde2vid_tpu.native import pack_windows

    n = 100
    xs = rng.integers(0, 44, n).astype(np.int16)
    ys = rng.integers(0, 36, n).astype(np.int16)
    ts = np.sort(rng.uniform(0, 1, n))
    ps = rng.integers(0, 2, n).astype(np.uint8)
    with pytest.raises(ValueError, match="out of range"):
        pack_windows(xs, ys, ts, ps, np.array([[0, n + 5]]), 256)
    with pytest.raises(ValueError, match="out of range"):
        pack_windows(xs, ys, ts, ps, np.array([[-1, 10]]), 256)
    with pytest.raises(ValueError, match="precedes"):
        pack_windows(xs, ys, ts, ps, np.array([[50, 10]]), 256)
    with pytest.raises(ValueError, match="length"):
        pack_windows(xs, ys, ts[:-1], ps, np.array([[0, 10]]), 256)
