"""Voxelizer unit tests: fused TPU formulation vs independent NumPy oracle."""

import numpy as np
import pytest

from bde2vid_tpu.events import (
    events_to_image,
    events_to_image_bilinear,
    events_to_neg_pos_voxel,
    events_to_timestamp_image,
    events_to_voxel,
    hot_event_mask,
    pad_events,
)
from bde2vid_tpu.events.voxel_np import (
    events_to_image_bilinear_np,
    events_to_image_np,
    events_to_neg_pos_voxel_np,
    events_to_voxel_np,
)
from tests.conftest import make_events

SENSOR = (64, 96)


def test_events_to_image_matches_oracle(rng):
    xs, ys, ts, ps = make_events(rng, n=4000, sensor_size=SENSOR)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    got = np.asarray(events_to_image(px, py, pp, n, sensor_size=SENSOR))
    want = events_to_image_np(xs, ys, ps, SENSOR)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_events_to_image_duplicate_coords_accumulate():
    xs = np.array([3, 3, 3], np.int32)
    ys = np.array([5, 5, 5], np.int32)
    ps = np.array([1.0, 1.0, -1.0], np.float32)
    px, py, pt, pp, n = pad_events(xs, ys, np.zeros(3, np.float32), ps)
    img = np.asarray(events_to_image(px, py, pp, n, sensor_size=SENSOR))
    assert img[5, 3] == pytest.approx(1.0)
    assert np.count_nonzero(img) == 1


def test_events_to_image_out_of_range_dropped(rng):
    xs = np.array([-1, 500, 10], np.int32)
    ys = np.array([2, 2, 500], np.int32)
    ps = np.ones(3, np.float32)
    px, py, pt, pp, n = pad_events(xs, ys, np.zeros(3, np.float32), ps)
    img = np.asarray(events_to_image(px, py, pp, n, sensor_size=SENSOR))
    assert img.sum() == pytest.approx(0.0)


def test_bilinear_image_matches_oracle(rng):
    n = 3000
    h, w = SENSOR
    xs = rng.uniform(0, w - 1, n).astype(np.float32)
    ys = rng.uniform(0, h - 1, n).astype(np.float32)
    ps = rng.choice(np.array([-1.0, 1.0], np.float32), size=n)
    px, py, pt, pp, nv = pad_events(xs, ys, np.zeros(n, np.float32), ps)
    got = np.asarray(
        events_to_image_bilinear(
            px.astype(np.float32), py.astype(np.float32), pp, nv, sensor_size=SENSOR
        )
    )
    want = events_to_image_bilinear_np(xs, ys, ps, SENSOR)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # mass conservation: bilinear weights of each in-range event sum to 1
    np.testing.assert_allclose(got.sum(), ps.sum(), atol=1e-2)


@pytest.mark.parametrize("num_bins", [1, 2, 5])
def test_voxel_matches_oracle(rng, num_bins):
    xs, ys, ts, ps = make_events(rng, n=6000, sensor_size=SENSOR)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    got = np.asarray(
        events_to_voxel(px, py, pt, pp, n, num_bins=num_bins, sensor_size=SENSOR)
    )
    want = events_to_voxel_np(xs, ys, ts, ps, num_bins, SENSOR)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_voxel_padding_is_inert(rng):
    """The same events at two different buffer capacities give the same voxel."""
    xs, ys, ts, ps = make_events(rng, n=1000, sensor_size=SENSOR)
    a = events_to_voxel(*pad_events(xs, ys, ts, ps, capacity=1024), sensor_size=SENSOR)
    b = events_to_voxel(*pad_events(xs, ys, ts, ps, capacity=4096), sensor_size=SENSOR)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_voxel_temporal_mass(rng):
    """Sum over bins+pixels == sum of polarities (bilinear bin weights sum to 1
    for interior timestamps; endpoints land exactly on a bin)."""
    xs, ys, ts, ps = make_events(rng, n=2000, sensor_size=SENSOR)
    v = np.asarray(
        events_to_voxel(*pad_events(xs, ys, ts, ps), num_bins=5, sensor_size=SENSOR)
    )
    np.testing.assert_allclose(v.sum(), ps.sum(), atol=1e-2)


def test_voxel_degenerate_dt():
    """All-equal timestamps: everything falls into bin 0, no NaNs."""
    xs = np.array([1, 2, 3], np.int32)
    ys = np.array([1, 2, 3], np.int32)
    ts = np.zeros(3, np.float32)
    ps = np.ones(3, np.float32)
    v = np.asarray(
        events_to_voxel(*pad_events(xs, ys, ts, ps), num_bins=5, sensor_size=SENSOR)
    )
    assert np.isfinite(v).all()
    assert v[0].sum() == pytest.approx(3.0)
    assert v[1:].sum() == pytest.approx(0.0)


def test_neg_pos_voxel_matches_oracle(rng):
    xs, ys, ts, ps = make_events(rng, n=3000, sensor_size=SENSOR)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    gp, gn = events_to_neg_pos_voxel(px, py, pt, pp, n, num_bins=5, sensor_size=SENSOR)
    wp, wn = events_to_neg_pos_voxel_np(xs, ys, ts, ps, 5, SENSOR)
    np.testing.assert_allclose(np.asarray(gp), wp, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gn), wn, atol=1e-3)


def test_timestamp_image_shapes_and_polarity(rng):
    xs, ys, ts, ps = make_events(rng, n=2000, sensor_size=SENSOR)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    ip, ineg = events_to_timestamp_image(
        px.astype(np.float32), py.astype(np.float32), pt, pp, n, sensor_size=SENSOR
    )
    assert ip.shape == (SENSOR[0] + 1, SENSOR[1] + 1)
    assert np.isfinite(np.asarray(ip)).all() and np.isfinite(np.asarray(ineg)).all()
    assert np.asarray(ip).min() >= 0.0  # normalized timestamps are nonneg


def test_hot_event_mask(rng):
    xs, ys, ts, ps = make_events(rng, n=500, sensor_size=SENSOR)
    # make pixel (10, 10) very hot
    xs = np.concatenate([xs, np.full(1000, 10, np.int32)])
    ys = np.concatenate([ys, np.full(1000, 10, np.int32)])
    ps = np.concatenate([ps, np.ones(1000, np.float32)])
    mask = hot_event_mask(xs, ys, np.abs(ps), SENSOR, num_hot=3)
    assert mask.shape == SENSOR
    assert mask[10, 10] == 0.0
    assert mask.sum() == SENSOR[0] * SENSOR[1] - 3


def test_pad_events_bucketing():
    xs = np.arange(5, dtype=np.int32)
    px, py, pt, pp, n = pad_events(xs, xs, xs.astype(np.float32), xs.astype(np.float32))
    assert len(px) == 1024 and n == 5
    px2, *_ = pad_events(
        np.arange(3000, dtype=np.int32),
        np.arange(3000, dtype=np.int32),
        np.arange(3000, dtype=np.float32),
        np.ones(3000, np.float32),
    )
    assert len(px2) == 4096


def test_voxel_grids_fixed_n(rng):
    from bde2vid_tpu.events.voxel import voxel_grids_fixed_n

    xs, ys, ts, ps = make_events(rng, n=5000, sensor_size=SENSOR)
    grids = voxel_grids_fixed_n(xs, ys, ts, ps, 5, 1000, sensor_size=SENSOR)
    # reference range(0, len-n, n): 4 grids for 5000/1000 — the final
    # full window at 4000 is dropped by the exclusive stop (quirk kept)
    assert len(grids) == 4
    for i, g in enumerate(grids):
        want = events_to_voxel_np(
            xs[i * 1000:(i + 1) * 1000], ys[i * 1000:(i + 1) * 1000],
            ts[i * 1000:(i + 1) * 1000] - ts[i * 1000],
            ps[i * 1000:(i + 1) * 1000], 5, SENSOR,
        )
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-3)


def test_voxel_grids_fixed_t(rng):
    from bde2vid_tpu.events.voxel import voxel_grids_fixed_t

    xs, ys, ts, ps = make_events(rng, n=5000, sensor_size=SENSOR, t1=1.0)
    grids = voxel_grids_fixed_t(xs, ys, ts, ps, 5, 0.25, sensor_size=SENSOR)
    # reference np.arange(t0, tk-t, t): 3 windows over duration 1.0 at
    # t=0.25 — the trailing window is dropped (quirk kept)
    assert len(grids) == 3
    covered = ts < ts[0] + 0.75
    total = sum(float(np.asarray(g).sum()) for g in grids)
    assert total == pytest.approx(float(ps[covered].sum()), abs=0.5)


def test_voxel_timesync_slices_by_time(rng):
    from bde2vid_tpu.events import events_to_voxel, events_to_voxel_timesync, pad_events

    xs, ys, ts, ps = make_events(rng, n=4000, sensor_size=(32, 48), t1=1.0)
    t0, t1 = 0.25, 0.75
    got = np.asarray(
        events_to_voxel_timesync(xs, ys, ts, ps, 5, t0, t1, sensor_size=(32, 48))
    )
    i0, i1 = np.searchsorted(ts, t0), np.searchsorted(ts, t1)
    px, py, pt, pp, n = pad_events(xs[i0:i1], ys[i0:i1], ts[i0:i1] - ts[i0], ps[i0:i1])
    want = np.asarray(events_to_voxel(px, py, pt, pp, n, num_bins=5, sensor_size=(32, 48)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    with pytest.raises(ValueError):
        events_to_voxel_timesync(xs, ys, ts, ps, 5, 0.5, 0.5)


def test_voxel_accumulate_hard_binning(rng):
    """temporal_bilinear=False mode: every event lands wholly in one bin and
    per-pixel mass is preserved."""
    from bde2vid_tpu.events import events_to_voxel_accumulate, pad_events

    h, w = 16, 24
    xs, ys, ts, ps = make_events(rng, n=2000, sensor_size=(h, w), t1=0.5)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    vox = np.asarray(
        events_to_voxel_accumulate(px, py, pt, pp, n, num_bins=5, sensor_size=(h, w))
    )
    # NumPy oracle: hard bin assignment
    dt = ts[-1] - ts[0]
    binf = np.clip(np.floor((ts - ts[0]) / dt * 5), 0, 4).astype(int)
    want = np.zeros((5, h, w), np.float64)
    np.add.at(want, (binf, ys, xs), ps)
    np.testing.assert_allclose(vox, want, atol=1e-4)
    # total signed mass preserved
    np.testing.assert_allclose(vox.sum(), ps.sum(), atol=1e-3)


def test_unpack_batched_events_roundtrip(rng):
    from bde2vid_tpu.events import unpack_batched_events

    a = rng.normal(size=(200, 4)).astype(np.float32)
    b = rng.normal(size=(700, 4)).astype(np.float32)
    packed = np.concatenate([a, b], axis=0)
    out = unpack_batched_events(packed, [200, 900])
    assert out.shape == (2, 1, 700, 4)
    np.testing.assert_array_equal(out[0, 0, :200], a)
    np.testing.assert_array_equal(out[0, 0, 200:], 0)
    np.testing.assert_array_equal(out[1, 0], b)


def test_bounds_mask_and_clip():
    from bde2vid_tpu.events.voxel_np import (
        clip_events_to_bounds,
        events_bounds_mask,
    )

    xs = np.array([0, 1, 5, 10])
    ys = np.array([0, 3, 8, 2])
    # reference semantics: x <= x_min excluded, x > x_max excluded
    mask = events_bounds_mask(xs, ys, 0, 5, 0, 8)
    np.testing.assert_array_equal(mask, [0.0, 1.0, 1.0, 0.0])
    cx, cy, cp = clip_events_to_bounds(xs, ys, np.ones(4), (8, 5))
    np.testing.assert_array_equal(cx, [0, 1, 5, 0])


def test_voxel_grid_as_image():
    from bde2vid_tpu.events.voxel_np import voxel_grid_as_image

    vox = np.arange(2 * 4 * 3, dtype=np.float64).reshape(2, 4, 3)
    img = voxel_grid_as_image(vox)
    assert img.shape == (4, 3 * 2 + 2)  # two bins + one 2-px splitter
    assert img.min() == 0.0 and img.max() == 255.0


def test_voxel_batch_matches_vmapped_single(rng):
    """The fused one-scatter batch op must equal vmap(events_to_voxel)
    per window, including windows with fewer valid events than capacity."""
    import jax

    from bde2vid_tpu.events.voxel import (
        events_to_neg_pos_voxel,
        events_to_neg_pos_voxel_batch,
        events_to_voxel,
        events_to_voxel_batch,
        pad_events,
    )

    sensor = (24, 32)
    C, cap = 5, 256
    xs = np.zeros((C, cap), np.int32)
    ys = np.zeros((C, cap), np.int32)
    ts = np.zeros((C, cap), np.float32)
    ps = np.zeros((C, cap), np.float32)
    ns = np.array([256, 100, 3, 1, 0], np.int32)
    for c in range(C):
        n = int(ns[c])
        if n:
            x, y, t, p = make_events(rng, n=n, sensor_size=sensor, t1=0.1)
            px, py, pt, pp, _ = pad_events(x, y, t, p, capacity=cap)
            xs[c], ys[c], ts[c], ps[c] = px, py, pt, pp

    got = np.asarray(
        events_to_voxel_batch(xs, ys, ts, ps, ns, num_bins=5, sensor_size=sensor)
    )
    want = np.asarray(
        jax.vmap(
            lambda x, y, t, p, n: events_to_voxel(
                x, y, t, p, n, num_bins=5, sensor_size=sensor
            )
        )(xs, ys, ts, ps, ns)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    gp, gn = events_to_neg_pos_voxel_batch(xs, ys, ts, ps, ns, num_bins=5, sensor_size=sensor)
    wp, wn = jax.vmap(
        lambda x, y, t, p, n: events_to_neg_pos_voxel(
            x, y, t, p, n, num_bins=5, sensor_size=sensor
        )
    )(xs, ys, ts, ps, ns)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gn), np.asarray(wn), atol=1e-5)
