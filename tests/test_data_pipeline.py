"""Data pipeline tests: windowing policies + sequence assembly vs oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from bde2vid_tpu.data import (
    between_frames_windows,
    k_events_windows,
    load_sequence,
    prefetch_to_device,
    t_seconds_windows,
)
from bde2vid_tpu.events import H5EventWriter
from bde2vid_tpu.events.voxel_np import events_to_voxel_np
from tests.conftest import make_events

SENSOR = (48, 64)


@pytest.fixture
def seq_file(tmp_path, rng):
    xs, ys, ts, ps = make_events(rng, n=20000, sensor_size=SENSOR, t1=2.0)
    path = str(tmp_path / "seq.h5")
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(8):
            w.add_image(
                (rng.uniform(0, 255, SENSOR)).astype(np.uint8), (i + 0.5) * 0.25
            )
    return path, (xs, ys, ts, np.where(ps > 0, 1.0, -1.0).astype(np.float32))


def test_between_frames_windows():
    w = between_frames_windows(np.array([10, 25, 40]))
    np.testing.assert_array_equal(w, [[0, 10], [10, 25], [25, 40]])


def test_k_events_windows():
    w = k_events_windows(100, k=30, sliding_window_w=0)
    np.testing.assert_array_equal(w, [[0, 30], [30, 60], [60, 90]])
    w2 = k_events_windows(100, k=30, sliding_window_w=10)
    # overlapping windows advance by k - sliding; the final window clips to
    # num_events (the reference would index out of bounds here and raise)
    assert (w2[:-1, 1] - w2[:-1, 0] == 30).all()
    assert w2[1, 0] - w2[0, 0] == 20
    assert w2[-1, 1] == 100


def test_load_sequence_between_frames(seq_file):
    path, (xs, ys, ts, ps) = seq_file
    seq = load_sequence(path, num_bins=5)
    assert len(seq) == 7  # num_frames - 1
    assert seq.sensor_size == SENSOR

    vox = np.asarray(seq.voxels())
    assert vox.shape == (7, 5, *SENSOR)

    # oracle: voxelize window 2 by hand
    i0, i1 = seq.windows[2]
    want = events_to_voxel_np(
        xs[i0:i1], ys[i0:i1], ts[i0:i1] - ts[i0], ps[i0:i1], 5, SENSOR
    )
    np.testing.assert_allclose(vox[2], want, atol=1e-3, rtol=1e-3)


def test_item_surface(seq_file):
    path, _ = seq_file
    seq = load_sequence(path, num_bins=5)
    it = seq.item(0)
    assert it.frame.shape == SENSOR
    assert it.frame.min() >= 0 and it.frame.max() <= 1
    assert it.dt > 0
    assert it.n_events >= 0
    assert it.flow is None  # no flow in file


def test_small_window_zero_voxel(tmp_path, rng):
    """Windows with <3 events produce a zero voxel (reference edge case)."""
    path = str(tmp_path / "tiny.h5")
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        # 2 events before frame 0, many after
        w.append_events(
            np.array([1, 2], np.int16),
            np.array([1, 2], np.int16),
            np.array([0.01, 0.02]),
            np.array([True, True]),
        )
        xs, ys, ts, ps = make_events(rng, n=1000, sensor_size=SENSOR, t1=1.0)
        w.append_events(xs, ys, ts + 0.1, ps > 0)
        w.add_image(np.zeros(SENSOR, np.uint8), 0.05)
        w.add_image(np.zeros(SENSOR, np.uint8), 0.9)
        w.add_image(np.zeros(SENSOR, np.uint8), 1.2)
    seq = load_sequence(path, num_bins=5)
    vox = np.asarray(seq.voxels())
    assert vox[0].sum() == 0.0  # <3 events
    assert np.abs(vox[1]).sum() > 0


def test_normalize_applies_legacy_norm(seq_file):
    path, _ = seq_file
    seq_n = load_sequence(path, num_bins=5, normalize=True)
    vox = np.asarray(seq_n.voxels())
    nz = vox[vox != 0]
    assert abs(nz.mean()) < 0.15  # approx zero-mean on nonzeros
    assert 0.5 < nz.std() < 1.5


def test_hot_filter_masks_pixels(seq_file):
    path, _ = seq_file
    seq = load_sequence(path, num_bins=5, hot_filter=True)
    vox = np.asarray(seq.voxels())
    hot = np.asarray(seq.hot_mask) == 0
    assert hot.sum() == 100
    assert (np.abs(vox).sum(axis=(0, 1))[hot] == 0).all()


def test_k_events_sequence(seq_file):
    path, _ = seq_file
    seq = load_sequence(path, num_bins=5, voxel_method={"method": "k_events", "k": 2000})
    assert len(seq) == 10
    vox = np.asarray(seq.voxels(stop=3))
    assert vox.shape == (3, 5, *SENSOR)


def test_prefetch_roundtrip(seq_file):
    path, _ = seq_file
    seq = load_sequence(path, num_bins=5)
    items = list(prefetch_to_device((seq.item(i).frame for i in range(3)), size=2))
    assert len(items) == 3
    np.testing.assert_allclose(np.asarray(items[1]), seq.item(1).frame)


def test_t_seconds_sequence(seq_file):
    path, _ = seq_file
    seq = load_sequence(
        path, num_bins=5, voxel_method={"method": "t_seconds", "t": 0.5}
    )
    # duration is tk - t0 (slightly under the 2.0s sampling range), so the
    # reference length formula int(duration / t) gives 3
    assert len(seq) == 3
    vox = np.asarray(seq.voxels())
    assert vox.shape == (3, 5, *SENSOR)
    assert np.abs(vox).sum() > 0


def test_t_seconds_on_memmap(tmp_path, seq_file):
    from bde2vid_tpu.events.tools import h5_to_memmap

    path, _ = seq_file
    out = str(tmp_path / "mm2")
    h5_to_memmap(path, out)
    seq = load_sequence(
        out, num_bins=5, ltype="MMP", voxel_method={"method": "t_seconds", "t": 0.5}
    )
    assert len(seq) == 3


def test_span_upload_voxels_bitexact_vs_padded(seq_file):
    """The raw-span upload path (unpadded events + window table, expanded by
    clamped gather on device) must reproduce the padded pack_windows path
    BIT-EXACTLY — including per-window f64 ts rebase and pm1 polarity."""
    from bde2vid_tpu.data import pipeline as pl

    path, _ = seq_file
    seq = load_sequence(path, num_bins=5)
    # force both paths explicitly
    span = seq._pack_span_batch(0, len(seq.windows))
    assert span is not None  # between_frames windows: contiguous, no overlap
    buf, span_cap = span
    fn_span = pl._cached_voxelize_span_fn(
        5, SENSOR, True, False, False, len(seq.windows), seq.capacity, span_cap
    )
    got = np.asarray(fn_span(buf, jnp.zeros((), jnp.float32)))

    packed = seq._pack_batch(0, len(seq.windows))
    fn_pad = pl._cached_voxelize_bytes_fn(
        5, SENSOR, True, False, False, len(seq.windows), seq.capacity
    )
    want = np.asarray(fn_pad(pl._pack_to_bytes(*packed), jnp.zeros((), jnp.float32)))
    np.testing.assert_array_equal(got, want)

    # and the public voxels() (which auto-selects the span path here)
    # matches too
    np.testing.assert_array_equal(np.asarray(seq.voxels()), want)


def test_span_upload_declines_when_bucket_exceeds_padded(tmp_path, rng):
    """The span-vs-padded guard must count the bytes ACTUALLY shipped: the
    span buffer pads to _span_bucket(n_span) (16384-event floor), so a
    small tail batch — few windows, tiny capacity — must take the padded
    path even though its unpadded span is smaller than the padded form."""
    from bde2vid_tpu.data.pipeline import _span_bucket

    xs, ys, ts, ps = make_events(rng, n=400, sensor_size=SENSOR, t1=2.0)
    path = str(tmp_path / "tiny.h5")
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(4):
            w.add_image(
                (rng.uniform(0, 255, SENSOR)).astype(np.uint8), (i + 0.5) * 0.5
            )
    seq = load_sequence(path, num_bins=5)
    n_w = len(seq.windows)
    # precondition: the bucketed span is bigger than the padded buffers
    # while the raw span is smaller (the pre-fix guard would pick span)
    n_span = int(seq.windows[:, 1].max() - seq.windows[:, 0].min())
    assert 9 * n_span + 8 * n_w < 9 * n_w * seq.capacity
    assert 9 * _span_bucket(n_span) + 8 * n_w >= 9 * n_w * seq.capacity
    assert seq._pack_span_batch(0, n_w) is None
    vox = np.asarray(seq.voxels())  # padded path still serves the data
    assert vox.shape == (n_w, 5, *SENSOR)
    assert np.isfinite(vox).all()


def test_span_upload_declines_overlapping_windows(seq_file):
    """k_events with a sliding window produces OVERLAPPING windows — an
    event would need two different ts rebases — so the span packer must
    decline (None) and voxels() must fall back to the padded path."""
    path, _ = seq_file
    seq = load_sequence(
        path, num_bins=5,
        voxel_method={"method": "k_events", "k": 3000, "sliding_window_w": 1000},
    )
    assert seq._pack_span_batch(0, len(seq.windows)) is None
    vox = np.asarray(seq.voxels())  # padded fallback still works
    assert np.isfinite(vox).all()


def test_item_dt_is_f64_raw_difference(tmp_path, rng):
    """The reference computes window dt from the RAW f64 timestamps BEFORE
    the f32 cast (h5_dataset.py:215-217,229). At a large absolute-time
    anchor (relative ts ~1500 s) the f32 relative timestamps quantize to a
    ~1e-4 grid, so a 5e-7 window reads dt == 0.0 from them; the f64 path
    must preserve it."""
    t0 = 1.7e9
    n = 65
    ts_all = np.concatenate([[t0], t0 + 1500.0 + np.linspace(0.0, 5e-7, n)])
    path = str(tmp_path / "dt.h5")
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(
            rng.integers(0, SENSOR[1], n + 1).astype(np.int16),
            rng.integers(0, SENSOR[0], n + 1).astype(np.int16),
            ts_all,
            rng.integers(0, 2, n + 1).astype(bool),
        )
    # window 1 = events [33, 66): entirely inside the tight cluster
    seq = load_sequence(path, voxel_method={"method": "k_events", "k": 33})
    item = seq.item(1)
    true_dt = float(ts_all[65] - ts_all[33])
    assert true_dt > 0
    assert item.dt == pytest.approx(true_dt, rel=1e-9)
    # the f32 relative-ts path would have produced exactly 0.0 here
    sl_ts = item.events[2][: item.n_events]
    assert float(sl_ts[-1] - sl_ts[0]) == 0.0


def test_no_span_upload_env_parse(monkeypatch):
    """BDE2VID_NO_SPAN_UPLOAD is value-aware: '0'/'false'/'no'/'' keep the
    span path ON; '1'/'true' force it OFF (a bare truthiness check read
    '=0' as disable)."""
    from bde2vid_tpu.data.pipeline import _no_span_upload

    for off in ("", "0", "false", "No", " 0 "):
        monkeypatch.setenv("BDE2VID_NO_SPAN_UPLOAD", off)
        assert _no_span_upload() is False, off
    monkeypatch.delenv("BDE2VID_NO_SPAN_UPLOAD")
    assert _no_span_upload() is False
    for on in ("1", "true", "yes", "TRUE"):
        monkeypatch.setenv("BDE2VID_NO_SPAN_UPLOAD", on)
        assert _no_span_upload() is True, on
