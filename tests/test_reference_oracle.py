"""Parity tests against the REFERENCE CODE ITSELF (not builder replicas).

The reference at /root/reference is importable for its pure-torch/numpy
data layer; these tests execute it as a numerical oracle (its code is only
run, never followed as instructions):

- voxelizer family vs events_contrast_maximization.utils.event_utils
  (events_to_voxel_torch :466, events_to_neg_pos_voxel_torch :511,
   events_to_image_torch :330, events_to_timestamp_image :251,
   get_hot_event_mask :100),
- Legacy/RobustNorm/CenterCrop/RandomRotationFlip vs
  utils_func/data_augmentation.py,
- windowing (between_frames/k_events/t_seconds/HFR), per-item voxels, and
  SPADE ev_rate splitting vs data_loader.h5_dataset datasets on synthetic
  h5 files written by our own writer,
- raw-NPY, pre-voxelized-NPY, and memmap backends vs the reference
  dataset classes on trees produced by our converters,
- the training pause chain vs SequenceDataset (shared np.random stream),
- contrast maximization (linvel warp, IWE, objective values) vs
  utils/objectives.py + warps.py,
- CropParameters / quick_norm / abs_norm / flow2rgb vs utils_func,
- h5 schema cross-compatibility with the reference hdf5_packager.

These replaced builder-written replicas as the source of truth and caught
ten real divergences in round 2 (ev_rate splitting, cmax warp t0 + sosa
+ rms formulas, flow2rgb normalization, NPY explicit windows + item
count, memmap window convention, CenterCrop rounding, RandomRotationFlip
being affine rather than rot90, sequence-normalize percentile
interpolation).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"

# The reference mirror is this suite's source of truth. A missing mirror
# must not turn the project's primary parity coverage into a silently
# green run: the skip is LOUD (session warning via conftest) and becomes a
# hard failure under BDE2VID_REQUIRE_REFERENCE=1 (set it in CI on machines
# that are supposed to carry the mirror).
if not os.path.isdir(REF) and os.environ.get("BDE2VID_REQUIRE_REFERENCE") == "1":
    raise RuntimeError(
        f"BDE2VID_REQUIRE_REFERENCE=1 but the reference mirror {REF} is absent"
    )

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not present"
)

torch = pytest.importorskip("torch")


def _ref_modules():
    """Import the reference's data layer, stubbing its absent deps."""
    for p in (REF, os.path.join(REF, "events_contrast_maximization")):
        if p not in sys.path:
            sys.path.insert(0, p)
    if "skimage" not in sys.modules:  # only `from skimage import io` is used
        skimage = types.ModuleType("skimage")
        skimage.io = types.ModuleType("skimage.io")
        sys.modules["skimage"] = skimage
        sys.modules["skimage.io"] = skimage.io
    import importlib

    eu = importlib.import_module("events_contrast_maximization.utils.event_utils")
    da = importlib.import_module("utils_func.data_augmentation")
    h5d = importlib.import_module("data_loader.h5_dataset")
    return eu, da, h5d


def _events(rng, n=4000, h=32, w=48, t0=0.0, t1=0.05, float_coords=False):
    xs = rng.integers(0, w, size=n).astype(np.int64)
    ys = rng.integers(0, h, size=n).astype(np.int64)
    if float_coords:
        xs = xs.astype(np.float64) + rng.uniform(0, 0.999, size=n)
        ys = ys.astype(np.float64) + rng.uniform(0, 0.999, size=n)
        xs = np.minimum(xs, w - 1.001)
        ys = np.minimum(ys, h - 1.001)
    ts = np.sort(rng.uniform(t0, t1, size=n))
    ts[0], ts[-1] = t0, t1  # pin the window ends
    ps = rng.choice(np.array([-1.0, 1.0]), size=n)
    return xs, ys, ts, ps


# ------------------------------- rasterizers --------------------------------


def test_voxel_matches_reference(rng):
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events import events_to_voxel, pad_events

    h, w, B = 32, 48, 5
    xs, ys, ts, ps = _events(rng, 4000, h, w)
    want = eu.events_to_voxel_torch(
        torch.from_numpy(xs.astype(np.float32)),
        torch.from_numpy(ys.astype(np.float32)),
        torch.from_numpy(ts.astype(np.float32)),
        torch.from_numpy(ps.astype(np.float32)),
        B,
        sensor_size=(h, w),
    ).numpy()
    # padded capacity > n: the validity mask must keep pad events inert
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps, capacity=8192)
    got = np.asarray(
        events_to_voxel(px, py, pt, pp, n, num_bins=B, sensor_size=(h, w))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_neg_pos_voxel_matches_reference(rng):
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events import events_to_neg_pos_voxel, pad_events

    h, w, B = 24, 32, 5
    xs, ys, ts, ps = _events(rng, 3000, h, w)
    want_pos, want_neg = eu.events_to_neg_pos_voxel_torch(
        torch.from_numpy(xs.astype(np.float32)),
        torch.from_numpy(ys.astype(np.float32)),
        torch.from_numpy(ts.astype(np.float32)),
        torch.from_numpy(ps.astype(np.float32)),
        B,
        sensor_size=(h, w),
    )
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps, capacity=4096)
    got_pos, got_neg = events_to_neg_pos_voxel(
        px, py, pt, pp, n, num_bins=B, sensor_size=(h, w)
    )
    np.testing.assert_allclose(np.asarray(got_pos), want_pos.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_neg), want_neg.numpy(), atol=1e-4)


def test_image_int_matches_reference(rng):
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events import events_to_image, pad_events

    h, w = 32, 48
    xs, ys, ts, ps = _events(rng, 3000, h, w)
    want = eu.events_to_image_torch(
        torch.from_numpy(xs),
        torch.from_numpy(ys),
        torch.from_numpy(ps.astype(np.float32)),
        sensor_size=(h, w),
        clip_out_of_range=False,
        interpolation=None,
        padding=False,
    ).numpy()
    px, py, _, pp, n = pad_events(xs, ys, ts, ps, capacity=4096)
    got = np.asarray(events_to_image(px, py, pp, n, sensor_size=(h, w)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("padding", [True, False])
def test_image_bilinear_matches_reference(rng, padding):
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events import events_to_image_bilinear, pad_events

    h, w = 32, 48
    xs, ys, ts, ps = _events(rng, 3000, h, w, float_coords=True)
    want = eu.events_to_image_torch(
        torch.from_numpy(xs).float(),
        torch.from_numpy(ys).float(),
        torch.from_numpy(ps.astype(np.float32)),
        sensor_size=(h, w),
        clip_out_of_range=True,
        interpolation="bilinear",
        padding=padding,
    ).numpy()
    px, py, _, pp, n = pad_events(xs, ys, ts, ps, capacity=4096)
    got = np.asarray(
        events_to_image_bilinear(px, py, pp, n, sensor_size=(h, w), padding=padding)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_timestamp_image_matches_reference(rng):
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events import events_to_timestamp_image, pad_events

    h, w = 32, 48
    xs, ys, ts, ps = _events(rng, 3000, h, w, float_coords=True)
    want_pos, want_neg = eu.events_to_timestamp_image(
        xs.astype(np.float64),
        ys.astype(np.float64),
        ts.astype(np.float64),
        ps.astype(np.float64),
        sensor_size=(h, w),
        clip_out_of_range=True,
        interpolation="bilinear",
        padding=True,
    )
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps, capacity=4096)
    got_pos, got_neg = events_to_timestamp_image(
        px, py, pt, pp, n, sensor_size=(h, w), padding=True
    )
    np.testing.assert_allclose(np.asarray(got_pos), want_pos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_neg), want_neg, atol=1e-4)


def test_hot_event_mask_matches_reference(rng):
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events import hot_event_mask

    h, w = 16, 24
    # concentrate events so hot pixels are unambiguous
    xs = rng.integers(0, w, size=5000)
    ys = rng.integers(0, h, size=5000)
    xs[:2000] = 3
    ys[:2000] = 5
    xs[2000:3500] = 10
    ys[2000:3500] = 2
    ps = np.ones(5000)
    want = eu.get_hot_event_mask(
        torch.from_numpy(xs), torch.from_numpy(ys), torch.from_numpy(ps),
        sensor_size=(h, w), num_hot=2,
    )
    want = np.asarray(want)
    got = hot_event_mask(xs, ys, ps, sensor_size=(h, w), num_hot=2)
    np.testing.assert_array_equal(got, want)


# --------------------------------- norms ------------------------------------


def test_legacy_norm_matches_reference(rng):
    _, da, _ = _ref_modules()
    from bde2vid_tpu.utils.norm import legacy_norm

    x = rng.normal(size=(5, 16, 24)).astype(np.float32)
    # plenty of zeros (the nonzero-only statistics matter) while KEEPING
    # negative values — real voxels are signed, and an abs() slipped into
    # the nonzero mean/std would pass on positive-only inputs
    x[np.abs(x) < 0.3] = 0.0
    want = da.LegacyNorm()(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(legacy_norm(jnp.asarray(x)))
    # float32 sum-reduction order differs between torch and XLA
    np.testing.assert_allclose(got, want, atol=5e-5)

    zeros = np.zeros((2, 4, 4), np.float32)
    np.testing.assert_array_equal(
        np.asarray(legacy_norm(jnp.asarray(zeros))),
        da.LegacyNorm()(torch.from_numpy(zeros.copy())).numpy(),
    )


@pytest.mark.parametrize("low,top", [(0.0, 95.0), (1.0, 99.0)])
def test_robust_norm_matches_reference(rng, low, top):
    _, da, _ = _ref_modules()
    from bde2vid_tpu.utils.norm import robust_norm

    x = rng.normal(size=(5, 16, 24)).astype(np.float32)
    want = da.RobustNorm(low_perc=low, top_perc=top)(
        torch.from_numpy(x.copy())
    ).numpy()
    got = np.asarray(robust_norm(jnp.asarray(x), low_perc=low, top_perc=top))
    np.testing.assert_allclose(got, want, atol=1e-5)


# ------------------------- dataset / windowing oracle ------------------------


@pytest.fixture
def synthetic_h5(tmp_path, rng):
    """Tiny canonical h5: 3000 events over [10.0, 10.3] s, 6 frames."""
    from bde2vid_tpu.events import H5EventWriter

    h, w, n = 16, 24, 3000
    path = str(tmp_path / "oracle.h5")
    xs = rng.integers(0, w, size=n).astype(np.int16)
    ys = rng.integers(0, h, size=n).astype(np.int16)
    ts = np.sort(rng.uniform(10.0, 10.3, size=n))
    ts[0], ts[-1] = 10.0, 10.3
    ps = rng.choice([True, False], size=n)
    writer = H5EventWriter(path, sensor_size=(h, w))
    writer.append_events(xs, ys, ts, ps)
    for i in range(6):
        writer.add_image(
            rng.integers(0, 256, size=(h, w)).astype(np.uint8), 10.0 + 0.05 * i
        )
    writer.finalize()
    return path, (h, w)


def test_between_frames_windows_match_reference(synthetic_h5):
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data.windowing import between_frames_windows
    from bde2vid_tpu.events import H5EventReader

    path, _ = synthetic_h5
    ds = h5d.DynamicH5Dataset(path, voxel_method={"method": "between_frames"})
    with H5EventReader(path) as reader:
        got = between_frames_windows(reader.frame_event_indices)
    want = np.asarray(ds.event_indices, np.int64)
    assert len(ds) == reader.num_frames - 1
    # our raw windows may carry at most ONE trailing window beyond the
    # reference item count (the pipeline trims to num_frames-1 items);
    # anything more would be surplus garbage the slice would mask
    assert len(got) - len(want) in (0, 1)
    np.testing.assert_array_equal(got[: len(want)], want)


def test_k_events_windows_match_reference(synthetic_h5):
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data.windowing import k_events_windows

    path, _ = synthetic_h5
    ds = h5d.DynamicH5Dataset(
        path, voxel_method={"method": "k_events", "k": 500, "sliding_window_w": 100}
    )
    got = k_events_windows(3000, 500, 100)
    want = np.asarray(ds.event_indices, np.int64)
    assert len(got) == len(ds)
    np.testing.assert_array_equal(got, want)


def test_t_seconds_windows_match_reference(synthetic_h5):
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data.windowing import t_seconds_windows
    from bde2vid_tpu.events import H5EventReader

    path, _ = synthetic_h5
    ds = h5d.DynamicH5Dataset(
        path,
        voxel_method={"method": "t_seconds", "t": 0.05, "sliding_window_t": 0.01},
    )
    with H5EventReader(path) as reader:
        # reference find_ts_index takes ABSOLUTE time; our reader shifts by t0
        got = t_seconds_windows(
            lambda t: reader.search_time(t - reader.t0),
            t0=10.0,
            duration=0.3,
            t=0.05,
            sliding_window_t=0.01,
        )
    want = np.asarray(ds.event_indices, np.int64)
    assert len(got) == len(ds)
    np.testing.assert_array_equal(got, want)


def test_dataset_item_voxels_match_reference(synthetic_h5):
    """End-to-end: our reader+windowing+voxelizer reproduce the reference
    DynamicH5Dataset's per-item voxel grids bit-for-bit (atol float)."""
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data.windowing import between_frames_windows
    from bde2vid_tpu.events import H5EventReader, events_to_voxel, pad_events

    path, (h, w) = synthetic_h5
    ds = h5d.DynamicH5Dataset(path, voxel_method={"method": "between_frames"})
    with H5EventReader(path) as reader:
        windows = between_frames_windows(reader.frame_event_indices)
        for i in range(len(ds)):
            want = ds[i]["events"].numpy()
            idx0, idx1 = windows[i]
            ev = reader.events(idx0, idx1)
            if len(ev) < 3:  # reference zeroes degenerate windows (:219-220)
                got = np.zeros((5, h, w), np.float32)
            else:
                px, py, pt, pp, n = pad_events(ev.xs, ev.ys, ev.ts, ev.ps)
                got = np.asarray(
                    events_to_voxel(px, py, pt, pp, n, num_bins=5, sensor_size=(h, w))
                )
            np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"item {i}")


def test_hfr_windows_match_reference(synthetic_h5):
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data.pipeline import hfr_windows
    from bde2vid_tpu.events import H5EventReader

    path, _ = synthetic_h5
    ds = h5d.DynamicH5DatasetHFR(
        data_path=path, k_framerate=3, voxel_method={"method": "between_frames"}
    )
    with H5EventReader(path) as reader:
        got = hfr_windows(reader, k_framerate=3)
    want = np.asarray(ds.event_indices, np.int64)
    assert len(got) - len(want) in (0, 1)  # see between_frames note above
    np.testing.assert_array_equal(got[: len(want)], want)


def test_spade_ev_rate_subvoxels_match_reference(synthetic_h5):
    """SPADE event-rate splitting: our flat sub-windows + per-sub-voxel
    grids must equal the reference SpadeE2VDataset's per-item stacks
    (np.array_split boundaries + float floor-div num_vox)."""
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data import load_sequence

    path, (h, w) = synthetic_h5
    ev_rate = 0.35
    ds = h5d.SpadeE2VDataset(
        dict(data_path=path, ev_rate=ev_rate,
             voxel_method={"method": "between_frames"})
    )
    seq = load_sequence(path, num_bins=5, ltype="SpadeH5", ev_rate=ev_rate)
    vox = np.asarray(seq.voxels())  # (num_flat, 5, h, w)

    flat_idx = 0
    for i in range(len(ds)):
        want = ds[i]["events"].numpy()  # (num_vox_i, 5, h, w)
        n_sub = want.shape[0]
        got = vox[flat_idx : flat_idx + n_sub]
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"item {i}")
        assert seq.item_last[i] == flat_idx + n_sub - 1
        flat_idx += n_sub
    assert flat_idx == len(vox)


# ------------------------- contrast maximization -----------------------------


def _ref_cmax_modules():
    for p in (
        os.path.join(REF, "events_contrast_maximization", "utils"),
        os.path.join(REF, "events_contrast_maximization"),
    ):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    return importlib.import_module("objectives"), importlib.import_module("warps")


def test_linvel_warp_matches_reference(rng):
    _, warps = _ref_cmax_modules()
    from bde2vid_tpu.events.cmax import linvel_warp

    xs, ys, ts, ps = _events(rng, 1000, 32, 48)
    params = np.array([4.0, -2.5])
    wx_ref, wy_ref, _, _ = warps.linvel_warp().warp(
        xs.astype(np.float64), ys.astype(np.float64), ts, ps, ts[-1], params
    )
    wx, wy = linvel_warp(
        jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
        jnp.asarray(ts, jnp.float32), jnp.asarray(params, jnp.float32),
        t0=float(ts[-1]),
    )
    np.testing.assert_allclose(np.asarray(wx), wx_ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(wy), wy_ref, atol=1e-3)


def test_get_iwe_matches_reference(rng):
    objectives, warps = _ref_cmax_modules()
    from bde2vid_tpu.events.cmax import get_iwe
    from bde2vid_tpu.events import pad_events

    # the reference rasterizes at the DEFAULT (180,240) sensor size no
    # matter what img_size says (get_iwe passes none to events_to_image_drv)
    h, w = 180, 240
    xs, ys, ts, ps = _events(rng, 2000, h - 8, w - 8)  # margin: warps stay in
    params = np.array([3.0, -2.0])
    want, _ = objectives.get_iwe(
        params, xs.astype(np.float64), ys.astype(np.float64), ts,
        ps.astype(np.float64), warps.linvel_warp(), (h, w),
    )
    px, py, pt, pp, n = pad_events(
        xs.astype(np.float32), ys.astype(np.float32), ts, ps
    )
    got = np.asarray(
        get_iwe(jnp.asarray(params, jnp.float32), px, py, pt, pp, n,
                img_size=(h, w), blur_sigma=None)
    )
    assert got.shape == want.shape  # both (h+1, w+1) bilinear-padded
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_get_iwe_boundary_events_match_reference(rng):
    """Events ON the image bounds (x==0, y==0, x/y at the far edge) after
    warping: the reference's events_bounds_mask drops x<=0 / y<=0 (open at
    min!) before rasterizing — a raster-side clip alone would keep x==0
    events and differ by a full event weight per boundary pixel (caught by
    review in r3: ~1% objective error on real windows)."""
    objectives, warps = _ref_cmax_modules()
    from bde2vid_tpu.events.cmax import get_iwe
    from bde2vid_tpu.events import pad_events

    h, w = 180, 240
    # full-frame events including hard zeros and far-edge coordinates
    xs, ys, ts, ps = _events(rng, 3000, h, w)
    xs[:50] = 0
    ys[50:100] = 0
    xs[100:150] = w - 1
    ys[150:200] = h - 1
    for params in (np.array([0.0, 0.0]), np.array([3.0, -2.0])):
        want, _ = objectives.get_iwe(
            params, xs.astype(np.float64), ys.astype(np.float64), ts,
            ps.astype(np.float64), warps.linvel_warp(), (h, w),
        )
        px, py, pt, pp, n = pad_events(
            xs.astype(np.float32), ys.astype(np.float32), ts, ps
        )
        got = np.asarray(
            get_iwe(jnp.asarray(params, jnp.float32), px, py, pt, pp, n,
                    img_size=(h, w), blur_sigma=None)
        )
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_cmax_objectives_match_reference(rng):
    objectives, _ = _ref_cmax_modules()
    from bde2vid_tpu.events import cmax

    iwe = np.abs(rng.normal(size=(24, 32))).astype(np.float64)
    pairs = [
        ("variance", objectives.variance_objective()),
        ("rms", objectives.rms_objective()),
        ("sos", objectives.sos_objective()),
        ("soe", objectives.soe_objective()),
        ("moa", objectives.moa_objective()),
        ("sosa", objectives.sosa_objective()),
    ]
    for name, ref_obj in pairs:
        want = float(ref_obj.evaluate_function(iwe=iwe, blur_sigma=0))
        got = float(cmax.OBJECTIVES[name](jnp.asarray(iwe, jnp.float32)))
        assert got == pytest.approx(want, rel=1e-4, abs=1e-4), name

    # isoa: ours is a sigmoid relaxation of the reference's hard count;
    # keep iwe values away from the threshold so both agree
    iwe_far = np.where(iwe > 0.5, 1.5, 0.0)
    want = float(objectives.isoa_objective().evaluate_function(iwe=iwe_far, blur_sigma=0))
    got = float(cmax.OBJECTIVES["isoa"](jnp.asarray(iwe_far, jnp.float32)))
    assert got == pytest.approx(want, rel=1e-3)


def test_zhu_timestamp_objective_matches_reference(rng):
    objectives, warps = _ref_cmax_modules()
    from bde2vid_tpu.events.cmax import zhu_timestamp_objective
    from bde2vid_tpu.events import pad_events

    # like the IWE oracle: the reference rasterizes at the default (180,240)
    # no matter what img_size says; keep a margin so warped events stay in
    h, w = 180, 240
    xs, ys, ts, ps = _events(rng, 3000, h - 10, w - 10)
    params = np.array([5.0, -3.0])
    ref_obj = objectives.zhu_timestamp_objective()
    want = float(
        ref_obj.evaluate_function(
            params=params, xs=xs.astype(np.float64), ys=ys.astype(np.float64),
            ts=ts, ps=ps.astype(np.float64),
            warpfunc=warps.linvel_warp(), img_size=(h, w),
        )
    )
    px, py, pt, pp, n = pad_events(
        xs.astype(np.float32), ys.astype(np.float32), ts, ps
    )
    got = float(
        zhu_timestamp_objective(
            jnp.asarray(params, jnp.float32), px, py, pt, pp, n,
            img_size=(h, w), blur_sigma=2.0,
        )
    )
    assert got == pytest.approx(want, rel=2e-3)


def test_derivative_image_matches_reference(rng):
    """Analytic derivative-image path (events_to_image_drv +
    interpolate_to_derivative_img, event_utils.py:186-249) via the get_iwe
    compute_gradient=True chain."""
    objectives, warps = _ref_cmax_modules()
    from bde2vid_tpu.events.cmax import get_iwe_drv
    from bde2vid_tpu.events import pad_events

    h, w = 180, 240
    xs, ys, ts, ps = _events(rng, 2000, h - 8, w - 8)
    params = np.array([3.0, -2.0])
    want_iwe, want_div = objectives.get_iwe(
        params, xs.astype(np.float64), ys.astype(np.float64), ts,
        ps.astype(np.float64), warps.linvel_warp(), (h, w),
        compute_gradient=True,
    )
    px, py, pt, pp, n = pad_events(
        xs.astype(np.float32), ys.astype(np.float32), ts, ps
    )
    got_iwe, got_div = get_iwe_drv(
        jnp.asarray(params, jnp.float32), px, py, pt, pp, n,
        img_size=(h, w), blur_sigma=None,
    )
    np.testing.assert_allclose(np.asarray(got_iwe), want_iwe, atol=1e-3)
    assert got_div.shape == want_div.shape  # (2, h+1, w+1)
    np.testing.assert_allclose(np.asarray(got_div), want_div, atol=1e-3)


# ----------------------- inference utils / viz / norms -----------------------


def _ref_utils_func():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    return (
        importlib.import_module("utils_func.inference_utils"),
        importlib.import_module("utils_func.utils"),
        importlib.import_module("utils_func.training_utils"),
    )


@pytest.mark.parametrize("hw", [(36, 44), (33, 47), (180, 240)])
def test_crop_parameters_match_reference(rng, hw):
    iu, _, _ = _ref_utils_func()
    from bde2vid_tpu.utils.padding import CropParameters

    h, w = hw
    ref = iu.CropParameters(w, h, num_encoders=3)
    mine = CropParameters(w, h, num_encoders=3)
    assert (mine.padding_top, mine.padding_bottom, mine.padding_left,
            mine.padding_right) == (ref.padding_top, ref.padding_bottom,
                                    ref.padding_left, ref.padding_right)

    img = rng.normal(size=(1, h, w, 1)).astype(np.float32)  # NHWC
    padded = np.asarray(mine.pad(jnp.asarray(img)))
    ref_padded = ref.pad(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_array_equal(padded.transpose(0, 3, 1, 2), ref_padded)
    # inverse crop recovers the image through both implementations
    np.testing.assert_array_equal(
        np.asarray(mine.crop(jnp.asarray(padded))), img
    )
    rc = ref.crop(torch.from_numpy(ref_padded)).numpy()
    np.testing.assert_array_equal(rc, img.transpose(0, 3, 1, 2))


def test_quick_abs_norm_match_reference(rng):
    _, uu, _ = _ref_utils_func()
    from bde2vid_tpu.utils.norm import abs_norm, quick_norm

    x = rng.normal(size=(16, 20)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(quick_norm(jnp.asarray(x))),
        uu.quick_norm(torch.from_numpy(x.copy())).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(abs_norm(jnp.asarray(x))),
        uu.abs_norm(torch.from_numpy(x.copy())).numpy(),
        atol=1e-6,
    )


def test_flow2rgb_matches_reference(rng):
    pytest.importorskip("cv2")
    _, _, tu = _ref_utils_func()
    from bde2vid_tpu.utils.flow_viz import flow2rgb

    dx = rng.normal(0, 0.3, (24, 32)).astype(np.float64)
    dy = rng.normal(0, 0.3, (24, 32)).astype(np.float64)
    got = flow2rgb(dx, dy).astype(np.int32)
    want = tu.flow2rgb(dx, dy).astype(np.int32)
    # uint8 rounding at HSV->BGR may differ by 1 in isolated pixels
    assert (np.abs(got - want) <= 1).mean() > 0.995
    got_m = flow2rgb(dx, dy, max_magnitude=10.0).astype(np.int32)
    want_m = tu.flow2rgb(dx, dy, max_magnitude=10.0).astype(np.int32)
    assert (np.abs(got_m - want_m) <= 1).mean() > 0.995


@pytest.fixture
def np_alltrue_shim():
    """The reference calls np.alltrue (removed in NumPy 2.0). SCOPED shim:
    removed on teardown so the rest of the suite runs against stock numpy —
    a permanent monkeypatch would let product code that accidentally calls
    np.alltrue pass full-suite runs while crashing in production."""
    added = not hasattr(np, "alltrue")
    if added:
        np.alltrue = np.all  # type: ignore[attr-defined]
    yield
    if added and hasattr(np, "alltrue"):
        del np.alltrue


def test_npy_dataset_items_match_reference(tmp_path, rng, np_alltrue_shim):
    """Raw-NPY backend vs the reference SynchronizedNPYDataset: explicit
    (possibly non-contiguous) frame_event_idxes pairs must be honored
    verbatim and per-item voxels must match (min_event_rate set high
    enough that the reference's random subsampling never triggers)."""
    _ref_modules()  # stubs skimage, puts REF on sys.path
    import importlib

    dsmod = importlib.import_module("data_loader.dataset")
    from bde2vid_tpu.data import load_sequence

    h, w, n = 16, 24, 3000
    base = tmp_path / "seq"
    ef = base / "events"
    ff = base / "frames"
    os.makedirs(ef)
    os.makedirs(ff)
    xs = rng.integers(0, w, n).astype(np.int16)
    ys = rng.integers(0, h, n).astype(np.int16)
    ts = np.sort(rng.uniform(0, 1.0, n))
    # stored as bool: the reference computes ps*2-1 on the RAW dtype, which
    # overflows for uint8 storage (0 -> 255); bool promotes to int safely
    ps = rng.choice([0, 1], n).astype(bool)
    np.save(ef / "xs.npy", xs)
    np.save(ef / "ys.npy", ys)
    np.save(ef / "ts.npy", ts)
    np.save(ef / "ps.npy", ps)
    frames = rng.integers(0, 256, (5, h, w)).astype(np.uint8)
    np.save(ff / "frames.npy", frames)
    frame_ts = np.array([0.2, 0.4, 0.6, 0.8, 1.0])
    np.savetxt(ff / "frame_ts.txt", frame_ts)
    # deliberately NON-contiguous windows (gaps between items)
    idxes = np.array([[0, 500], [600, 1100], [1100, 1900], [2000, 2600],
                      [2650, 3000]])
    np.savetxt(ff / "frame_event_idxes.txt", idxes, fmt="%d")

    ds = dsmod.SynchronizedNPYDataset(
        str(base), "events", frame_folder="frames", flow_folder=None,
        min_event_rate=1e9,  # never subsample -> deterministic
    )
    seq = load_sequence(str(base), num_bins=5, ltype="ENPY")
    vox = np.asarray(seq.voxels())
    assert len(seq) == len(ds) == 5
    for i in range(len(ds)):
        want = ds[i]["events"].numpy()
        np.testing.assert_allclose(vox[i], want, atol=1e-4, err_msg=f"item {i}")
        # frame pairing: first frame whose ts >= events
        np.testing.assert_allclose(
            seq.frames(i, i + 1)[0], ds[i]["frame"].numpy().squeeze(), atol=1e-6
        )


def test_prevoxelized_npy_matches_reference(tmp_path, rng, np_alltrue_shim):
    """PrevoxelizedSequence vs the reference SynchronizedFramesEventsDataset
    (VoxelGridDataset inside) on a tree produced by h5_to_prevoxelized_npy:
    voxels, normalization, and first-frame-at-or-after pairing."""
    _ref_modules()
    import importlib

    dsmod = importlib.import_module("data_loader.dataset")

    from bde2vid_tpu.data import load_sequence
    from bde2vid_tpu.events import H5EventWriter
    from bde2vid_tpu.events.tools import h5_to_prevoxelized_npy

    h, w, n = 16, 24, 3000
    h5 = str(tmp_path / "s.h5")
    xs = rng.integers(0, w, n).astype(np.int16)
    ys = rng.integers(0, h, n).astype(np.int16)
    ts = np.sort(rng.uniform(10.0, 10.3, n))
    ts[0], ts[-1] = 10.0, 10.3
    with H5EventWriter(h5, sensor_size=(h, w)) as wr:
        wr.append_events(xs, ys, ts, rng.choice([True, False], n))
        for i in range(6):
            wr.add_image(rng.integers(0, 256, (h, w)).astype(np.uint8),
                         10.0 + 0.05 * i)
    base = str(tmp_path / "tree")
    h5_to_prevoxelized_npy(h5, base, num_bins=5)

    for normalize in (False, True):
        ref = dsmod.SynchronizedFramesEventsDataset(
            base, "VoxelGrid-betweenframes-5", frame_folder="frames",
            flow_folder=None, normalize=normalize,
        )
        seq = load_sequence(base, num_bins=5, ltype="NPY", normalize=normalize)
        assert len(seq) == len(ref)
        vox = np.asarray(seq.voxels())
        frames = seq.frames()
        for i in range(len(ref)):
            item = ref[i]
            np.testing.assert_allclose(
                vox[i], item["events"].numpy(), atol=5e-4,
                err_msg=f"item {i} normalize={normalize}",
            )
            np.testing.assert_allclose(
                frames[i], item["frame"].numpy().squeeze(), atol=1e-6
            )


def test_memmap_dataset_items_match_reference(tmp_path, rng):
    """h5 -> h5_to_memmap -> the reference MemMapDataset reads the tree and
    its windows/voxels/frames match our MMP pipeline on the same files."""
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data import load_sequence
    from bde2vid_tpu.events import H5EventWriter
    from bde2vid_tpu.events.tools import h5_to_memmap

    h, w, n = 16, 24, 3000
    h5 = str(tmp_path / "s.h5")
    xs = rng.integers(0, w, n).astype(np.int16)
    ys = rng.integers(0, h, n).astype(np.int16)
    ts = np.sort(rng.uniform(10.0, 10.3, n))
    ts[0], ts[-1] = 10.0, 10.3
    with H5EventWriter(h5, sensor_size=(h, w)) as wr:
        wr.append_events(xs, ys, ts, rng.choice([True, False], n))
        for i in range(6):
            wr.add_image(rng.integers(0, 256, (h, w)).astype(np.uint8),
                         10.0 + 0.05 * i)
    mmp = str(tmp_path / "mmp")
    h5_to_memmap(h5, mmp)

    ds = h5d.MemMapDataset(mmp, voxel_method={"method": "between_frames"})
    seq = load_sequence(mmp, num_bins=5, ltype="MMP")
    assert len(seq) == len(ds)
    vox = np.asarray(seq.voxels())
    frames = seq.frames()
    for i in range(len(ds)):
        item = ds[i]
        np.testing.assert_allclose(
            vox[i], item["events"].numpy(), atol=1e-4, err_msg=f"item {i}"
        )
        np.testing.assert_allclose(
            frames[i], item["frame"].numpy().squeeze(), atol=1e-6
        )


def test_sequence_pause_chain_matches_reference(tmp_path, rng):
    """Training pause augmentation vs the reference SequenceDataset: with a
    shared np.random stream, our sample_pause_mask must reproduce the
    reference's Markov pause chain exactly (zeroed events + repeated
    frames, step 0 never paused)."""
    _, _, h5d = _ref_modules()
    from bde2vid_tpu.data import load_sequence
    from bde2vid_tpu.data.transforms import sample_pause_mask
    from bde2vid_tpu.events import H5EventWriter
    from bde2vid_tpu.events.tools import h5_to_memmap

    h, w, n = 16, 24, 4000
    h5 = str(tmp_path / "s.h5")
    xs = rng.integers(0, w, n).astype(np.int16)
    ys = rng.integers(0, h, n).astype(np.int16)
    ts = np.sort(rng.uniform(0.0, 1.2, n))
    ts[0], ts[-1] = 0.0, 1.2
    with H5EventWriter(h5, sensor_size=(h, w)) as wr:
        wr.append_events(xs, ys, ts, rng.choice([True, False], n))
        for i in range(12):
            wr.add_image(rng.integers(0, 256, (h, w)).astype(np.uint8),
                         0.05 + 0.1 * i)
    mmp = str(tmp_path / "mmp")
    h5_to_memmap(h5, mmp)

    L, step, p_run, p_paused = 6, 2, 0.45, 0.7
    ds = h5d.SequenceDataset(
        mmp, sequence_length=L, dataset_type="MemMapDataset", step_size=step,
        proba_pause_when_running=p_run, proba_pause_when_paused=p_paused,
        dataset_kwargs={"voxel_method": {"method": "between_frames"}},
    )
    np.random.seed(123)
    ref_seq = ds[1]  # base index j = 2
    assert len(ref_seq) == L

    np.random.seed(123)  # same uniform stream as the reference consumed
    idx, paused = sample_pause_mask(L, np.random, p_run, p_paused)

    seq = load_sequence(mmp, num_bins=5, ltype="MMP")
    vox = np.asarray(seq.voxels())
    frames = seq.frames()
    for t in range(L):
        want_v = ref_seq[t]["events"].numpy()
        want_f = ref_seq[t]["frame"].numpy().squeeze()
        src = 2 + int(idx[t])
        got_v = np.zeros_like(vox[src]) if paused[t] else vox[src]
        np.testing.assert_allclose(got_v, want_v, atol=1e-4, err_msg=f"t={t}")
        np.testing.assert_allclose(frames[src], want_f, atol=1e-6, err_msg=f"t={t}")
    assert paused.any(), "chain never paused — raise probabilities"


def test_center_crop_matches_reference(rng):
    _, da, _ = _ref_modules()
    from bde2vid_tpu.data.transforms import CenterCrop

    x = rng.normal(size=(5, 37, 45)).astype(np.float32)
    for size in (16, (20, 30)):
        want = da.CenterCrop(size)(torch.from_numpy(x.copy())).numpy()
        got = np.asarray(CenterCrop(size)(x))
        np.testing.assert_array_equal(got, want)


def test_h5_schema_cross_compatible_with_reference_packager(tmp_path, rng):
    """Files written by the reference hdf5_packager must load through our
    reader/pipeline, and files from our writer must carry the identical
    schema (datasets, dtypes, attrs, per-image event_idx)."""
    tools_path = os.path.join(REF, "events_contrast_maximization", "tools")
    if tools_path not in sys.path:  # guarded like _ref_modules: repeated
        sys.path.insert(0, tools_path)  # runs must not stack duplicates
    import importlib

    ep = importlib.import_module("event_packagers")
    import h5py

    from bde2vid_tpu.data import load_sequence
    from bde2vid_tpu.events import H5EventReader, H5EventWriter

    h, w, n = 16, 24, 2000
    xs = rng.integers(0, w, n).astype(np.int16)
    ys = rng.integers(0, h, n).astype(np.int16)
    ts = np.sort(rng.uniform(0.0, 0.5, n))
    ps = rng.choice([True, False], n)
    imgs = [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(4)]
    img_ts = [0.1, 0.2, 0.3, 0.4]

    ref_path = str(tmp_path / "ref.h5")
    pk = ep.hdf5_packager(ref_path)
    pk.set_data_available(num_images=len(imgs), num_flow=0)
    pk.package_events(xs, ys, ts, ps)
    for i, (im, t) in enumerate(zip(imgs, img_ts)):
        pk.package_image(im, t, i)
    pk.add_metadata(int(ps.sum()), int((~ps).sum()), ts[-1] - ts[0],
                    ts[0], ts[-1], len(imgs), 0, (h, w))
    pk.events_file.close()

    ours_path = str(tmp_path / "ours.h5")
    with H5EventWriter(ours_path, sensor_size=(h, w)) as wr:
        wr.append_events(xs, ys, ts, ps)
        for im, t in zip(imgs, img_ts):
            wr.add_image(im, t)

    # 1) reference-written file loads through our full pipeline
    with H5EventReader(ref_path) as r:
        assert r.num_events == n and r.num_frames == 4
        sl = r.events(0, n)
        np.testing.assert_array_equal(sl.xs, xs)
        np.testing.assert_array_equal(sl.ps > 0, ps)
    seq = load_sequence(ref_path, num_bins=5)
    assert np.isfinite(np.asarray(seq.voxels())).all()

    # 2) our file carries the identical schema
    with h5py.File(ref_path) as fr, h5py.File(ours_path) as fo:
        for d in ("events/xs", "events/ys", "events/ts", "events/ps"):
            assert fo[d].dtype == fr[d].dtype, d
            np.testing.assert_array_equal(fo[d][:], fr[d][:])
        for a in ("num_events", "num_pos", "num_neg", "num_imgs", "t0", "tk"):
            assert fo.attrs[a] == fr.attrs[a], a
        assert np.isclose(fo.attrs["duration"], fr.attrs["duration"])
        np.testing.assert_array_equal(
            fo.attrs["sensor_resolution"], fr.attrs["sensor_resolution"]
        )
        for i in range(4):
            k = f"images/image{i:09d}"
            np.testing.assert_array_equal(fo[k][:], fr[k][:])
            assert fo[k].attrs["event_idx"] == fr[k].attrs["event_idx"], k
            assert fo[k].attrs["timestamp"] == fr[k].attrs["timestamp"]


@pytest.mark.parametrize("is_flow", [False, True])
def test_random_rotation_flip_matches_reference(rng, is_flow):
    """Continuous-angle affine rotation + flips: with the same sampled
    (angle, hflip, vflip), our grid-sampled transform must match the
    reference's F.affine_grid/grid_sample path, including the inverse-
    matrix flow channel mixing."""
    import random as pyrandom

    _, da, _ = _ref_modules()
    from bde2vid_tpu.data.transforms import RandomRotationFlip

    c = 2 if is_flow else 5
    x = rng.normal(size=(c, 24, 32)).astype(np.float32)

    ref_t = da.RandomRotationFlip(degrees=30, p_hflip=0.6, p_vflip=0.6)
    pyrandom.seed(77)
    want = ref_t(torch.from_numpy(x.copy()), is_flow=is_flow).numpy()
    if want.ndim == 4:  # reference squeezes dim 0 itself; be robust
        want = want[0]

    # replay the exact same python-random draws the reference consumed
    pyrandom.seed(77)
    angle = pyrandom.uniform(-30, 30)
    hflip = pyrandom.random() < 0.6
    vflip = pyrandom.random() < 0.6
    mine = RandomRotationFlip(degrees=30, p_hflip=0.6, p_vflip=0.6)
    mine.set_params(angle, hflip, vflip)
    got = mine(x, is_flow=is_flow)
    assert hflip or vflip or abs(angle) > 1e-6  # transform is non-trivial
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_normalize_image_sequence_matches_reference(rng):
    _, da, _ = _ref_modules()
    from bde2vid_tpu.data.transforms import normalize_image_sequence

    frames = rng.normal(0.5, 0.3, (6, 16, 20)).astype(np.float32)
    seq = [{"frame": torch.from_numpy(f.copy())} for f in frames]
    da.normalize_image_sequence_(seq, key="frame")
    want = np.stack([item["frame"].numpy() for item in seq])
    got = np.asarray(normalize_image_sequence(jnp.asarray(frames)))
    np.testing.assert_allclose(got, want, atol=1e-5)


# --------------------- end-to-end driver oracle -------------------------------


def test_eval_driver_end_to_end_matches_reference_chain(tmp_path, rng):
    """Authoritative end-to-end oracle: the reference's FULL metric
    aggregation chain (InferenceDataLoader item -> Croper pad -> model ->
    crop -> per-step metric -> sum/T -> results[dataset][seq] JSON,
    eval_models_seq.py:147-282 + :123-144) executed with the reference's
    own data layer and a torch replica model, diffed against this repo's
    eval driver output on the SAME h5 tree and converted checkpoint —
    schema (exact key nesting) and values."""
    import json

    import torch.nn.functional as F

    from tests.test_checkpoint_convert import TWrap, _torch_states

    eu, da, h5d = _ref_modules()
    iu, _, _ = _ref_utils_func()

    # -- synthetic dataset tree: HQF/{s1,s2}.h5 (non-/4 sensor: pad matters)
    from bde2vid_tpu.events import H5EventWriter

    sensor = (38, 46)
    os.makedirs(tmp_path / "HQF")
    n_frames = 5
    for name in ("s1", "s2"):
        xs = rng.integers(0, sensor[1], 9000).astype(np.int64)
        ys = rng.integers(0, sensor[0], 9000).astype(np.int64)
        ts = np.sort(rng.uniform(0, 1.0, 9000))
        ps = rng.choice([0, 1], 9000).astype(bool)
        with H5EventWriter(str(tmp_path / "HQF" / f"{name}.h5"), sensor_size=sensor) as w:
            w.append_events(xs, ys, ts, ps)
            for i in range(n_frames):
                w.add_image(
                    rng.uniform(0, 255, sensor).astype(np.uint8),
                    (i + 0.5) / n_frames,
                )

    # -- shared model: torch replica + pytorch-template checkpoint
    torch.manual_seed(0)
    base, num_enc = 8, 2
    tmodel = TWrap(num_bins=5, base=base, num_enc=num_enc, num_res=1).eval()
    ckpt = {
        "arch": "E2VIDRecurrent",
        "config": {"arch": {"args": {"unet_kwargs": {
            "num_bins": 5, "base_num_channels": base, "num_encoders": num_enc,
            "num_residual_blocks": 1, "skip_type": "sum",
            "recurrent_block_type": "convlstm"}}}},
        "state_dict": tmodel.state_dict(),
    }
    ckpt_path = str(tmp_path / "epoch_3.pth")
    torch.save(ckpt, ckpt_path)

    # -- reference chain (eval_model / eval_model_alldata transcription)
    dataset_kwargs = {
        "transforms": {}, "max_length": None, "sensor_resolution": None,
        "num_bins": 5, "filter_hot_events": False,
        "voxel_method": {"method": "between_frames", "k": 0, "t": 0,
                         "sliding_window_w": 0, "sliding_window_t": 0},
    }
    ref_results = {}
    ref_details = {}
    for name in ("s1", "s2"):
        loader = h5d.InferenceDataLoader(
            str(tmp_path / "HQF" / f"{name}.h5"),
            dataset_kwargs=dict(dataset_kwargs), ltype="H5",
            num_workers=0, pin_memory=False,
        )
        crop = iu.Croper(num_enc)
        states = None
        result = {"mse": 0.0}
        detail = {"mse": []}
        items = list(loader)
        T = len(items)
        with torch.no_grad():
            for item in items:
                h, w = item["frame"].shape[-2:]
                crop.update_params(w, h)
                padded = crop.pad(item["events"])
                if states is None:  # lazy zero-state at the PADDED size,
                    # like the reference ConvLSTM (submodules.py:300-310)
                    states = _torch_states(
                        1, padded.shape[-2], padded.shape[-1], base, num_enc
                    )
                pred, states = tmodel.unetrecurrent(padded, states)
                image_float = crop.crop(pred)
                v = F.mse_loss(image_float, item["frame"])
                result["mse"] += float(v)
                detail["mse"].append(float(v))
        result["mse"] /= T
        ref_results.setdefault("HQF", {})[name] = result
        ref_details.setdefault("HQF", {})[name] = detail
    ref_file = str(tmp_path / "ref_org.txt")
    with open(ref_file, "w") as fp:
        json.dump(ref_results, fp)

    # -- this repo's driver on the converted checkpoint
    from bde2vid_tpu.eval import EvalConfig, evaluate_all
    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(ckpt_path)
    out_file = str(tmp_path / "out" / "epoch_3_org.txt")
    cfg = EvalConfig(metrics=("mse",), subseq_L=None, max_length=None)
    evaluate_all(spec, ["HQF/s1.h5", "HQF/s2.h5"], str(tmp_path), out_file,
                 cfg, progress=False)

    with open(out_file) as fp:
        got = json.load(fp)
    with open(ref_file) as fp:
        want = json.load(fp)
    # schema: exact nesting and key order (both insertion-ordered dicts)
    assert list(got) == list(want)
    assert list(got["HQF"]) == list(want["HQF"])
    for name in ("s1", "s2"):
        assert list(got["HQF"][name]) == list(want["HQF"][name])
        assert got["HQF"][name]["mse"] == pytest.approx(
            want["HQF"][name]["mse"], rel=1e-4, abs=1e-6
        ), name
    with open(out_file.replace(".txt", "_detail.txt")) as fp:
        got_detail = json.load(fp)
    for name in ("s1", "s2"):
        np.testing.assert_allclose(
            got_detail["HQF"][name]["mse"], ref_details["HQF"][name]["mse"],
            rtol=1e-4, atol=1e-6,
        )

    # -- eq variant: the reference's cv2.equalizeHist round-trip on BOTH
    # pred and gt (eval_models_seq.py:246-252, torch2cv2/cv2torch) vs the
    # driver's --eq path (histogram-op equalize, cv2-parity-tested)
    cv2 = pytest.importorskip("cv2")
    import dataclasses

    ref_eq = {}
    for name in ("s1", "s2"):
        loader = h5d.InferenceDataLoader(
            str(tmp_path / "HQF" / f"{name}.h5"),
            dataset_kwargs=dict(dataset_kwargs), ltype="H5",
            num_workers=0, pin_memory=False,
        )
        crop = iu.Croper(num_enc)
        states = None
        total, count = 0.0, 0
        with torch.no_grad():
            for item in loader:
                h, w = item["frame"].shape[-2:]
                crop.update_params(w, h)
                padded = crop.pad(item["events"])
                if states is None:
                    states = _torch_states(
                        1, padded.shape[-2], padded.shape[-1], base, num_enc
                    )
                pred, states = tmodel.unetrecurrent(padded, states)
                image_float = crop.crop(pred)

                def eq_roundtrip(t):  # torch2cv2 -> equalizeHist -> cv2torch
                    u8 = (np.clip(t.squeeze().numpy(), 0, 1) * 255).astype(np.uint8)
                    return torch.from_numpy(cv2.equalizeHist(u8)).float()[None, None] / 255.0

                v = F.mse_loss(eq_roundtrip(image_float), eq_roundtrip(item["frame"]))
                total += float(v)
                count += 1
        ref_eq[name] = total / count

    out_eq = str(tmp_path / "out" / "epoch_3_eq.txt")
    evaluate_all(
        spec, ["HQF/s1.h5", "HQF/s2.h5"], str(tmp_path), out_eq,
        dataclasses.replace(cfg, eq=True), progress=False,
    )
    with open(out_eq) as fp:
        got_eq = json.load(fp)
    for name in ("s1", "s2"):
        # our equalize is histogram-op (>=99.9% of pixels within one code
        # value of cv2); per-sequence mse agrees to ~1e-5
        assert got_eq["HQF"][name]["mse"] == pytest.approx(
            ref_eq[name], rel=1e-3, abs=2e-5
        ), name


def test_voxel_grids_fixed_n_t_match_reference(rng):
    """Window COUNTS and contents of the fixed-n / fixed-t grid lists must
    match the reference exactly — including its dropped-tail quirks
    (range(0, len-n, n) excludes a final full window; np.arange(t0, tk-t, t)
    drops the trailing window). r3 review: the port silently emitted them."""
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events.voxel import voxel_grids_fixed_n, voxel_grids_fixed_t

    h, w = 24, 32
    xs, ys, ts, ps = _events(rng, 5000, h, w, t1=1.0)
    t_xs = torch.from_numpy(xs.astype(np.float32))
    t_ys = torch.from_numpy(ys.astype(np.float32))
    t_ts = torch.from_numpy(ts.astype(np.float32))
    t_ps = torch.from_numpy(ps.astype(np.float32))

    want = eu.voxel_grids_fixed_n_torch(t_xs, t_ys, t_ts, t_ps, 5, 1000,
                                        sensor_size=(h, w))
    got = voxel_grids_fixed_n(xs, ys, ts, ps, 5, 1000, sensor_size=(h, w))
    assert len(got) == len(want) == 4
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), wv.numpy(), atol=1e-3)

    want_t = eu.voxel_grids_fixed_t_torch(t_xs, t_ys, t_ts, t_ps, 5, 0.25,
                                          sensor_size=(h, w))
    got_t = voxel_grids_fixed_t(xs, ys, ts, ps, 5, 0.25, sensor_size=(h, w))
    assert len(got_t) == len(want_t) == 3
    for g, wv in zip(got_t, want_t):
        np.testing.assert_allclose(np.asarray(g), wv.numpy(), atol=1e-3)


def test_event_idx_recovery_matches_packager_convention(tmp_path, rng):
    """Frames WITHOUT event_idx attrs must recover max(0, searchsorted-1)
    (event_packagers.py:83-89) — a bare searchsorted shifted every
    recovered window by one event vs attr-carrying files (r3 review)."""
    import h5py

    from bde2vid_tpu.events import H5EventReader, H5EventWriter

    h, w = 16, 20
    xs = rng.integers(0, w, 2000)
    ys = rng.integers(0, h, 2000)
    ts = np.sort(rng.uniform(0, 1.0, 2000))
    ps = rng.choice([0, 1], 2000).astype(bool)
    path = str(tmp_path / "a.h5")
    with H5EventWriter(path, sensor_size=(h, w)) as wtr:
        wtr.append_events(xs, ys, ts, ps)
        for i in range(5):
            wtr.add_image(rng.uniform(0, 255, (h, w)).astype(np.uint8),
                          (i + 0.5) / 5)
    with H5EventReader(path) as r:
        with_attrs = np.array(r.frame_event_indices)
    with h5py.File(path, "r+") as f:
        for k in f["images"]:
            del f["images"][k].attrs["event_idx"]
    with H5EventReader(path) as r:
        recovered = np.array(r.frame_event_indices)
    np.testing.assert_array_equal(recovered, with_attrs)


def test_timestamp_image_out_of_range_matches_reference(rng):
    """Events BEYOND the clip range must reproduce the reference's quirk:
    the timestamp image scatters UN-masked weights (event_utils.py:305-313),
    so an out-of-range event's coordinates zero but its normalized-ts
    weight still deposits around the origin pixel — unlike the image /
    derivative scatters, whose weights are masked (masked_ps). Negative
    coordinates are excluded: the reference never clips them (torch
    index_put_ would wrap), a documented divergence."""
    eu, _, _ = _ref_modules()
    from bde2vid_tpu.events import (
        events_to_image_bilinear,
        events_to_timestamp_image,
        pad_events,
    )

    h, w = 24, 32
    n = 2000
    xs, ys, ts, ps = _events(rng, n, h, w, float_coords=True)
    oor_x = rng.random(n) < 0.08
    oor_y = rng.random(n) < 0.08
    xs[oor_x] += w  # beyond the padded clip (img_size-1)
    ys[oor_y] += h

    want_pos, want_neg = eu.events_to_timestamp_image(
        xs.astype(np.float64), ys.astype(np.float64),
        ts.astype(np.float64), ps.astype(np.float64),
        sensor_size=(h, w), clip_out_of_range=True,
        interpolation="bilinear", padding=True,
    )
    px, py, pt, pp, pn = pad_events(xs, ys, ts, ps, capacity=2048)
    got_pos, got_neg = events_to_timestamp_image(
        px, py, pt, pp, pn, sensor_size=(h, w), padding=True
    )
    assert float(np.abs(want_pos[:2, :2]).sum()) > 0  # the quirk fires
    np.testing.assert_allclose(np.asarray(got_pos), want_pos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_neg), want_neg, atol=1e-4)

    # ...while the plain image scatter MASKS those weights (masked_ps)
    want_img, _ = eu.events_to_image_drv(
        xs.astype(np.float64), ys.astype(np.float64), ps.astype(np.float64),
        None, None, sensor_size=(h, w), clip_out_of_range=True,
        interpolation="bilinear", padding=True,
    )
    got_img = np.asarray(
        events_to_image_bilinear(px, py, pp, pn, sensor_size=(h, w), padding=True)
    )
    np.testing.assert_allclose(got_img, want_img, atol=1e-4)


def test_hot_pixel_sequence_semantics_match_reference():
    """Sequence-level hot-pixel chain (reference add_hot_pixels_to_sequence_,
    data_augmentation.py:48-59): ONE pattern drawn per sequence, the same
    (x, y, val) added to EVERY item's voxels, duplicate coordinates
    accumulating. RNG sources differ (python/torch vs jax), so the oracle
    pins the semantics on each side against an explicit numpy scatter built
    from that side's own draws."""
    import random as pyrandom

    _, da, _ = _ref_modules()
    T, B, H, W = 4, 5, 18, 22
    base = np.random.RandomState(0).randn(T, B, H, W).astype(np.float32)

    # --- reference side: replay its draws into a numpy scatter ---
    seq = [{"events": torch.from_numpy(base[t].copy())} for t in range(T)]
    pyrandom.seed(123)
    torch.manual_seed(456)
    da.add_hot_pixels_to_sequence_(seq, hot_pixel_std=2.0,
                                   max_hot_pixel_fraction=0.5)
    pyrandom.seed(123)
    torch.manual_seed(456)
    frac = pyrandom.uniform(0, 0.5)
    n = int(frac * W * H)
    assert n >= 2  # chain exercises multiple pixels
    x = torch.randint(0, W, (n,)).numpy()
    y = torch.randint(0, H, (n,)).numpy()
    val = (torch.randn(n) * 2.0).numpy()
    img = np.zeros((H, W), np.float32)
    np.add.at(img, (y, x), val)
    for t in range(T):
        np.testing.assert_allclose(
            seq[t]["events"].numpy(), base[t] + img[None], atol=1e-6)

    # --- our side: same semantics from the jax draws ---
    from bde2vid_tpu.data.transforms import add_hot_pixels_to_sequence

    vox = jnp.asarray(np.transpose(base, (0, 2, 3, 1)))  # (T, H, W, C)
    key = jax.random.PRNGKey(7)
    got = np.asarray(add_hot_pixels_to_sequence(
        vox, key, hot_pixel_std=2.0, max_hot_pixel_fraction=0.5))

    k0, k1, k2, k3 = jax.random.split(key, 4)
    frac_j = float(jax.random.uniform(k0)) * 0.5
    max_n = max(int(0.5 * H * W), 1)
    xs = np.asarray(jax.random.randint(k1, (max_n,), 0, W))
    ys = np.asarray(jax.random.randint(k2, (max_n,), 0, H))
    vals = np.asarray(jax.random.normal(k3, (max_n,))) * 2.0
    n_act = int(np.float32(frac_j) * H * W)
    img_j = np.zeros((H, W), np.float32)
    np.add.at(img_j, (ys[:n_act], xs[:n_act]), vals[:n_act])
    want = np.transpose(base, (0, 2, 3, 1)) + img_j[None, :, :, None]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_window_chain_matches_reference(tmp_path):
    """The train CLI's on-device window chain (item-select -> pause-zero ->
    full-sensor rotation/flip -> crop, train/__main__._window_device_fn)
    against the reference training protocol: per-item RandomRotationFlip
    with the shared per-sequence seed (h5_dataset.py:708-712) followed by
    the crop, with paused items zeroed."""
    import random as pyrandom

    import bde2vid_tpu.train.__main__ as tm

    _, da, _ = _ref_modules()
    L, B, H, W = 4, 5, 24, 32
    ch, cw, y0, x0 = 16, 16, 3, 9
    rng0 = np.random.RandomState(1)
    vox = rng0.randn(L, B, H, W).astype(np.float32)
    idx = np.array([0, 1, 1, 2])
    paused = np.array([False, True, False, False])  # note idx[1] repeats 1? no:
    # reference pause repeats the PREVIOUS item and zeroes it; idx/paused
    # here encode select-then-zero, the sampler's contract
    ref_t = da.RandomRotationFlip(degrees=25, p_hflip=0.6, p_vflip=0.6)

    want = []
    for t in range(L):
        item = torch.from_numpy(vox[idx[t]].copy())
        pyrandom.seed(99)  # the shared per-sequence seed, re-seeded per item
        r = ref_t(item)
        if r.ndim == 4:
            r = r[0]
        r = r[:, y0:y0 + ch, x0:x0 + cw].numpy()
        if paused[t]:
            r = np.zeros_like(r)
        want.append(r)
    want = np.transpose(np.stack(want), (0, 2, 3, 1))  # (L, ch, cw, B) NHWC

    # replay the reference's sampled params into our matrix builder
    from bde2vid_tpu.data.transforms import RandomRotationFlip

    pyrandom.seed(99)
    angle = pyrandom.uniform(-25, 25)
    hflip = pyrandom.random() < 0.6
    vflip = pyrandom.random() < 0.6
    assert hflip or vflip or abs(angle) > 1e-6
    mine = RandomRotationFlip(degrees=25, p_hflip=0.6, p_vflip=0.6)
    mine.set_params(angle, hflip, vflip)

    f = tm._window_device_fn(ch, cw, True)
    got = np.asarray(f(jnp.asarray(vox), jnp.asarray(idx, jnp.int32),
                       jnp.asarray(paused), jnp.int32(y0), jnp.int32(x0),
                       jnp.asarray(mine._fwd)))
    np.testing.assert_allclose(got, want, atol=2e-4)
