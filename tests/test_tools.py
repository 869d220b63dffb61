"""Event tools tests: converters, memmap backend, HFR and ev_rate windowing."""

import numpy as np
import pytest

from bde2vid_tpu.data import load_sequence
from bde2vid_tpu.events import H5EventReader, H5EventWriter
from bde2vid_tpu.events.tools import (
    MemMapEventReader,
    add_hdf5_attribute,
    h5_cut,
    h5_to_memmap,
    txt_to_h5,
)
from tests.conftest import make_events

SENSOR = (48, 64)


@pytest.fixture
def h5_file(tmp_path, rng):
    xs, ys, ts, ps = make_events(rng, n=8000, sensor_size=SENSOR, t1=2.0)
    path = str(tmp_path / "seq.h5")
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(6):
            w.add_image(rng.integers(0, 255, SENSOR).astype(np.uint8), (i + 0.5) / 3)
    return path


def test_txt_to_h5_roundtrip(tmp_path, rng):
    xs, ys, ts, ps = make_events(rng, n=500, sensor_size=SENSOR, t1=1.0)
    txt = tmp_path / "events.txt"
    with open(txt, "w") as fp:
        fp.write(f"{SENSOR[1]} {SENSOR[0]}\n")
        for t, x, y, p in zip(ts, xs, ys, ps):
            fp.write(f"{t:.9f} {x} {y} {1 if p > 0 else 0}\n")
    out = str(tmp_path / "events.h5")
    txt_to_h5(str(txt), out)
    with H5EventReader(out) as r:
        assert r.num_events == 500
        assert r.sensor_size == SENSOR
        sl = r.events(0, 500)
        np.testing.assert_array_equal(sl.xs, xs)
        np.testing.assert_allclose(sl.ts, ts - ts[0], atol=1e-6)


def test_h5_cut(tmp_path, h5_file):
    out = str(tmp_path / "cut.h5")
    h5_cut(h5_file, out, 0.5, 1.5)
    with H5EventReader(h5_file) as r0, H5EventReader(out) as r1:
        assert 0 < r1.num_events < r0.num_events
        assert r1.num_frames < r0.num_frames
        sl = r1.events(0, r1.num_events)
        assert sl.ts.max() <= 1.0 + 1e-6  # shifted window span


def test_add_hdf5_attribute(h5_file):
    add_hdf5_attribute(h5_file, "source", "ijrr")
    with H5EventReader(h5_file) as r:
        assert r.f.attrs["source"] == "ijrr"


def test_h5_to_memmap_and_reader(tmp_path, h5_file):
    out = str(tmp_path / "mm")
    h5_to_memmap(h5_file, out)
    mm = MemMapEventReader(out)
    with H5EventReader(h5_file) as r:
        assert mm.num_events == r.num_events
        assert mm.num_frames == r.num_frames
        assert mm.sensor_size == tuple(r.sensor_size)
        a = mm.events(10, 50)
        b = r.events(10, 50)
        np.testing.assert_array_equal(a.xs, b.xs)
        np.testing.assert_allclose(a.ts, b.ts, atol=1e-5)
        np.testing.assert_allclose(mm.frame(0), r.frame(0), atol=1e-6)


def test_load_sequence_mmp_matches_h5(tmp_path, h5_file):
    """The two backends differ by the REFERENCE's own convention gap: h5
    window ends are per-image event_idx attrs (searchsorted - 1,
    event_packagers.py) while the memmap loader searchsorts frame
    timestamps directly (h5_dataset.py:645-647) — one event apart. Windows
    must match up to that off-by-one and the voxels must agree after
    removing the boundary event's bounded contribution."""
    out = str(tmp_path / "mm")
    h5_to_memmap(h5_file, out)
    seq_h5 = load_sequence(h5_file, num_bins=5)
    seq_mm = load_sequence(out, num_bins=5, ltype="MMP")
    assert len(seq_mm) == len(seq_h5)
    d = seq_mm.item_windows[: len(seq_mm)] - seq_h5.item_windows[: len(seq_h5)]
    assert np.abs(d).max() <= 1
    v_h5 = np.asarray(seq_h5.voxels())
    v_mm = np.asarray(seq_mm.voxels())
    # per-pixel check (a scalar-mass check alone would pass mass-preserving
    # scrambles like swapped axes or reversed bin order): voxelize the H5
    # events over the MEMMAP backend's exact windows — identical windows
    # must give bit-identical grids, isolating the boundary convention gap
    # (asserted <= 1 above) from the event data / voxelization itself
    from bde2vid_tpu.data.pipeline import EventSequence
    from bde2vid_tpu.events import H5EventReader

    with H5EventReader(h5_file) as r:
        cross = EventSequence(r, np.asarray(seq_mm.item_windows), num_bins=5)
        v_cross = np.asarray(cross.voxels())
    np.testing.assert_allclose(v_mm, v_cross, atol=1e-4)
    # off-by-one windows: one boundary event shifts dt slightly; total
    # signed mass vs the h5 windows differs by at most those events'
    # polarities
    np.testing.assert_allclose(
        v_mm.sum(axis=(1, 2, 3)), v_h5.sum(axis=(1, 2, 3)), atol=2.5
    )
    assert np.isfinite(v_mm).all()


def test_spade_ev_rate_splitting(h5_file):
    seq = load_sequence(h5_file, num_bins=5, ltype="SpadeH5", ev_rate=0.05)
    assert seq.item_last is not None
    assert len(seq.windows) >= len(seq)  # flat sub-windows
    assert seq.item_last[-1] == len(seq.windows) - 1
    # sub-windows tile each item window exactly
    for i in range(len(seq)):
        lo = seq.item_last[i - 1] + 1 if i else 0
        hi = seq.item_last[i]
        assert seq.windows[lo, 0] == seq.item_windows[i, 0]
        assert seq.windows[hi, 1] == seq.item_windows[i, 1]
    vox = np.asarray(seq.voxels())
    assert vox.shape[0] == len(seq.windows)


def test_hfr_windows(h5_file):
    seq1 = load_sequence(h5_file, num_bins=5)
    seq2 = load_sequence(h5_file, num_bins=5, k_framerate=3)
    assert len(seq2) == len(seq1)
    # HFR windows end at the same frame indices but start later (shorter span)
    assert (seq2.windows[:, 1] == seq1.windows[: len(seq2), 1]).all()
    assert (seq2.windows[1:, 0] >= seq1.windows[1 : len(seq2), 0]).all()


def test_h5_precompute_voxels_roundtrip(h5_file, rng):
    """h5 -> in-h5 voxel cache -> eval equals on-the-fly h5 eval
    (reference h5_to_between_frames cache format)."""
    import jax

    from bde2vid_tpu.eval import EvalConfig, evaluate_sequence
    from bde2vid_tpu.events.tools import h5_precompute_voxels
    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.models.api import ModelSpec

    written = h5_precompute_voxels(h5_file, num_bins=5)
    assert written == 5  # num_frames - 1
    # idempotent: existing datasets are skipped (reference :111-113)
    assert h5_precompute_voxels(h5_file, num_bins=5) == 0

    seq_h5 = load_sequence(h5_file, num_bins=5)
    seq_vox = load_sequence(h5_file, num_bins=5, ltype="H5VOX")
    np.testing.assert_allclose(
        np.asarray(seq_vox.voxels()),
        np.asarray(seq_h5.voxels())[: len(seq_vox)],
        atol=1e-4,
    )
    np.testing.assert_allclose(seq_vox.frames(), seq_h5.frames()[: len(seq_vox)])

    cfg_m = {"num_bins": 5, "num_encoders": 2, "base_num_channels": 8,
             "num_residual_blocks": 1}
    import jax.numpy as jnp

    model = build_model("E2VIDRecurrent", cfg_m)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)), model.initial_state(1, 64, 64)
    )
    spec = ModelSpec("E2VIDRecurrent", model, params, 5, 2)
    cfg = EvalConfig(metrics=("mse", "ssim"), subseq_L=None, max_length=None)
    res_h5, _ = evaluate_sequence(spec, load_sequence(h5_file, num_bins=5), cfg)
    res_vox, _ = evaluate_sequence(
        spec, load_sequence(h5_file, num_bins=5, ltype="H5VOX"), cfg
    )
    for k in res_h5:
        assert res_vox[k] == pytest.approx(res_h5[k], rel=1e-3, abs=1e-5)


def test_h5_to_prevoxelized_npy_roundtrip(h5_file, tmp_path, rng):
    """h5 -> NPY voxel/frame tree -> eval equals h5 -> eval."""
    import jax
    import jax.numpy as jnp

    from bde2vid_tpu.eval import EvalConfig, evaluate_sequence
    from bde2vid_tpu.events.tools import h5_to_prevoxelized_npy
    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.models.api import ModelSpec

    out = str(tmp_path / "npytree")
    h5_to_prevoxelized_npy(h5_file, out, num_bins=5)

    seq_h5 = load_sequence(h5_file, num_bins=5)
    seq_npy = load_sequence(out, num_bins=5, ltype="NPY")
    assert len(seq_npy) == len(seq_h5)
    np.testing.assert_allclose(
        np.asarray(seq_npy.voxels()), np.asarray(seq_h5.voxels()), atol=1e-4
    )
    np.testing.assert_allclose(seq_npy.frames(), seq_h5.frames(), atol=1e-6)

    cfg_m = {"num_bins": 5, "num_encoders": 2, "base_num_channels": 8,
             "num_residual_blocks": 1}
    model = build_model("E2VIDRecurrent", cfg_m)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)), model.initial_state(1, 64, 64)
    )
    spec = ModelSpec("E2VIDRecurrent", model, params, 5, 2)
    cfg = EvalConfig(metrics=("mse", "ssim"), subseq_L=None, max_length=None)
    res_h5, _ = evaluate_sequence(spec, load_sequence(h5_file, num_bins=5), cfg)
    res_npy, _ = evaluate_sequence(
        spec, load_sequence(out, num_bins=5, ltype="NPY"), cfg
    )
    for k in res_h5:
        assert res_npy[k] == pytest.approx(res_h5[k], rel=1e-3, abs=1e-5)


def _ros_stamp(t):
    from types import SimpleNamespace

    return SimpleNamespace(secs=int(t), nsecs=int(round((t - int(t)) * 1e9)))


def test_bag_message_extractor_packages_canonical_h5(tmp_path, rng):
    """Rosbag-free packaging core: synthetic ROS-shaped messages -> h5
    (reference rosbag_to_h5.py:42-136 format semantics)."""
    from types import SimpleNamespace

    from bde2vid_tpu.events.rosbag import BagMessageExtractor

    h, w = 20, 30
    path = str(tmp_path / "bag.h5")
    ex = BagMessageExtractor(
        path, "/cam0/events", "/cam0/image_raw", zero_timestamps=True,
        max_buffer=50,
    )

    t_base = 100.0
    n = 200
    ts = np.sort(rng.uniform(t_base, t_base + 1.0, n))
    ts[0] = t_base
    xs = rng.integers(0, w, n)
    ys = rng.integers(0, h, n)
    ps = rng.choice([True, False], n)
    # events arrive in 4 EventArray messages of 50
    for c in range(0, n, 50):
        events = [
            SimpleNamespace(x=int(xs[i]), y=int(ys[i]), ts=_ros_stamp(ts[i]),
                            polarity=bool(ps[i]))
            for i in range(c, c + 50)
        ]
        msg = SimpleNamespace(header=SimpleNamespace(stamp=_ros_stamp(ts[c])),
                              events=events)
        ex.consume("/cam0/events", msg)
        # one mono8 image per chunk
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        imsg = SimpleNamespace(
            header=SimpleNamespace(stamp=_ros_stamp(ts[min(c + 49, n - 1)])),
            height=h, width=w, encoding="mono8", data=img.tobytes(),
        )
        ex.consume("/cam0/image_raw", imsg)
    ex.consume("/other/topic", SimpleNamespace())  # ignored
    ex.finish()

    with H5EventReader(path) as r:
        assert r.num_events == n
        assert r.num_frames == 4
        assert r.sensor_size == (h, w)
        sl = r.events(0, n)
        np.testing.assert_array_equal(sl.xs, xs)
        np.testing.assert_array_equal(sl.ys, ys)
        np.testing.assert_array_equal(sl.ps > 0, ps)
        # zero_timestamps: stored ts start at 0 (within ROS nsec resolution)
        assert abs(float(r.t0)) < 1e-6
        np.testing.assert_allclose(sl.ts, ts - t_base, atol=1e-5)
        # the file is loadable by the standard pipeline
        seq = load_sequence(path, num_bins=5)
        assert len(seq) >= 1
        v = np.asarray(seq.voxels())
        assert np.isfinite(v).all()


def test_decode_image_msg_color_and_gray():
    from types import SimpleNamespace

    from bde2vid_tpu.events.rosbag import decode_image_msg

    rgb = np.zeros((2, 3, 3), np.uint8)
    rgb[..., 0] = 200  # red channel in rgb8
    msg = SimpleNamespace(height=2, width=3, encoding="rgb8", data=rgb.tobytes())
    bgr = decode_image_msg(msg, is_color=True)
    assert bgr[0, 0, 2] == 200 and bgr[0, 0, 0] == 0  # channel-swapped
    gray = decode_image_msg(msg, is_color=False)
    assert gray.shape == (2, 3) and int(gray[0, 0]) == round(0.299 * 200)


def test_rosbag_to_h5_raises_clean_importerror(tmp_path):
    from bde2vid_tpu.events.rosbag import rosbag_to_h5

    with pytest.raises(ImportError, match="BagMessageExtractor"):
        rosbag_to_h5(str(tmp_path), str(tmp_path / "out"))


def test_h5_cut_preserves_float64_timestamps(tmp_path):
    """h5_cut must copy timestamps losslessly (float64), not round-trip
    through EventSlice's float32 relative time: at t~2000 s float32
    quantizes to ~1e-4 s and collapses microsecond-spaced events."""
    n = 1000
    t0 = 1.7e9  # epoch-style absolute origin
    # one anchor event at t0, then microsecond-spaced events at relative
    # +2000 s where float32 relative time fails
    late = t0 + 2000.0 + np.arange(n) * 1e-6
    ts = np.concatenate([[t0], late])
    path = str(tmp_path / "late.h5")
    rg = np.random.default_rng(3)
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(
            rg.integers(0, SENSOR[1], n + 1).astype(np.int16),
            rg.integers(0, SENSOR[0], n + 1).astype(np.int16),
            ts,
            rg.integers(0, 2, n + 1).astype(bool),
        )
    out = str(tmp_path / "late_cut.h5")
    h5_cut(path, out, 1999.0, 2001.0)
    import h5py

    with h5py.File(out) as f:
        got = np.asarray(f["events/ts"])
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, late)
    # strictly increasing: float32 would collapse neighbors to equal stamps
    assert (np.diff(got) > 0).all()


def test_h5_to_memmap_preserves_float64_timestamps(tmp_path):
    n = 512
    t0 = 1.7e9
    # anchor at t0 so the cluster sits at relative +1500 s (float32-fatal)
    ts = np.concatenate([[t0], t0 + 1500.0 + np.arange(n) * 1e-6])
    path = str(tmp_path / "late2.h5")
    rg = np.random.default_rng(4)
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(
            rg.integers(0, SENSOR[1], n + 1).astype(np.int16),
            rg.integers(0, SENSOR[0], n + 1).astype(np.int16),
            ts,
            rg.integers(0, 2, n + 1).astype(bool),
        )
    out = str(tmp_path / "mm_late")
    h5_to_memmap(path, out)
    got = np.load(f"{out}/t.npy")
    np.testing.assert_array_equal(got, ts)
    assert (np.diff(got) > 0).all()


def test_search_time_float_parity_across_backends(tmp_path):
    """searchsorted(ts_abs, t + t0) is NOT float-equivalent to the H5
    reader's per-element (ts[mid] - t0) < t comparison: at this (t0, ts, t)
    triple (found by numeric search) the two roundings disagree, and the
    NPY/MMP backends used to place the boundary event in a different
    t_seconds window than the H5 backend for the SAME recording. All
    backends must agree exactly."""
    from bde2vid_tpu.events.tools import NPYEventReader, _search_time_shifted

    t0 = 1636961687.3214543
    tsm = 1636961687.3214812
    q = 2.6941299538476564e-05  # (tsm - t0) < q True, tsm < (q + t0) False
    assert ((tsm - t0) < q) and not (tsm < (q + t0))  # still a counterexample
    ts = np.array([t0, tsm, t0 + 1.0], np.float64)
    xs = np.array([1, 2, 3], np.int16)
    ys = np.array([1, 2, 3], np.int16)
    ps = np.array([1, 0, 1], bool)

    path = str(tmp_path / "cx.h5")
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(xs, ys, ts, ps)
        w.add_image(np.zeros(SENSOR, np.uint8), 0.0)
    h5r = H5EventReader(path)

    mm_dir = str(tmp_path / "cx_mm")
    h5_to_memmap(path, mm_dir)
    mmr = MemMapEventReader(mm_dir)

    nd = tmp_path / "cx_npy"
    (nd / "events").mkdir(parents=True)
    (nd / "frames").mkdir()
    np.save(nd / "events" / "xs.npy", xs)
    np.save(nd / "events" / "ys.npy", ys)
    np.save(nd / "events" / "ts.npy", ts)
    np.save(nd / "events" / "ps.npy", ps.astype(np.uint8))
    np.save(nd / "frames" / "frames.npy", np.zeros((1,) + SENSOR, np.uint8))
    np.savetxt(nd / "frames" / "frame_ts.txt", [t0])
    np.savetxt(nd / "frames" / "frame_event_idxes.txt", [[0, 3]], fmt="%d")
    npr = NPYEventReader(str(nd))

    want_l = h5r.search_time(q, side="left")
    want_r = h5r.search_time(q, side="right")
    assert want_l == 2  # the H5 semantics place the boundary event INSIDE
    for r in (mmr, npr):
        assert r.search_time(q, side="left") == want_l
        assert r.search_time(q, side="right") == want_r
    # and the helper matches the H5 loop over a dense query sweep
    rg = np.random.default_rng(0)
    dense = np.sort(rg.uniform(-1e-4, 1.0 + 1e-4, 200))
    for t in dense:
        for side in ("left", "right"):
            assert _search_time_shifted(ts, t0, float(t), side) == h5r.search_time(
                float(t), side
            )
    h5r.close() if hasattr(h5r, "close") else None
