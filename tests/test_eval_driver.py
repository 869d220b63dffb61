"""End-to-end eval driver test: synthetic h5 -> model -> metrics -> table."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bde2vid_tpu.data import load_sequence
from bde2vid_tpu.eval import EvalConfig, evaluate_all, evaluate_sequence
from bde2vid_tpu.events import H5EventWriter
from bde2vid_tpu.models import build_model
from bde2vid_tpu.models.api import ModelSpec
from tests.conftest import make_events

SENSOR = (36, 44)  # not /16 — exercises Croper padding
CFG = {"num_bins": 5, "num_encoders": 2, "base_num_channels": 8, "num_residual_blocks": 1}


def _make_spec(name="E2VIDRecurrent"):
    model = build_model(name, CFG)
    voxel = jnp.zeros((1, 64, 64, 5))
    params = model.init(jax.random.PRNGKey(0), voxel, model.initial_state(1, 64, 64))
    # num_encoders must match what the real checkpoint loader would set:
    # FireNet has no strided encoders (num_encoders=0, no Croper padding,
    # asserted in test_checkpoint_convert) — testing it with 2 would run a
    # padding path production FireNet eval never takes
    n_enc = 0 if name == "FireNet" else 2
    return ModelSpec(name=name, module=model, params=params, num_bins=5,
                     num_encoders=n_enc)


def _write_seq(path, rng, num_frames=6):
    xs, ys, ts, ps = make_events(rng, n=12000, sensor_size=SENSOR, t1=1.0)
    with H5EventWriter(str(path), sensor_size=SENSOR) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(num_frames):
            w.add_image(
                (rng.uniform(0, 255, SENSOR)).astype(np.uint8),
                (i + 0.5) / num_frames,
            )


def test_evaluate_sequence_schema(tmp_path, rng):
    _write_seq(tmp_path / "a.h5", rng)
    seq = load_sequence(str(tmp_path / "a.h5"), num_bins=5)
    spec = _make_spec()
    cfg = EvalConfig(metrics=("mse", "ssim"), subseq_L=3, max_length=None)
    result, detail = evaluate_sequence(spec, seq, cfg)
    assert set(result) == {"mse", "ssim"}
    T = len(seq)
    assert len(detail["mse"]) == T
    assert result["mse"] == pytest.approx(sum(detail["mse"]) / T, rel=1e-5)
    assert 0 <= result["ssim"] <= 1
    assert np.isfinite(result["mse"])


def test_evaluate_sequence_pause(tmp_path, rng):
    _write_seq(tmp_path / "a.h5", rng, num_frames=8)
    seq = load_sequence(str(tmp_path / "a.h5"), num_bins=5)
    spec = _make_spec()
    cfg = EvalConfig(metrics=("mse",), subseq_L=None, max_length=None, pause_st=2, pause_ed=5)
    result, detail = evaluate_sequence(spec, seq, cfg)
    assert np.isfinite(result["mse"])


def test_evaluate_all_writes_results_and_table(tmp_path, rng):
    os.makedirs(tmp_path / "DSET")
    _write_seq(tmp_path / "DSET" / "s1.h5", rng)
    _write_seq(tmp_path / "DSET" / "s2.h5", rng)
    spec = _make_spec("FireNet")
    cfg = EvalConfig(metrics=("mse", "ssim"), subseq_L=None, max_length=None)
    result_file = str(tmp_path / "out" / "model_org.txt")
    results = evaluate_all(
        spec, ["DSET/s1.h5", "DSET/s2.h5"], str(tmp_path), result_file, cfg, progress=False
    )
    assert "DSET" in results and set(results["DSET"]) == {"s1", "s2"}
    # files exist and parse
    with open(result_file) as fp:
        loaded = json.load(fp)
    assert loaded["DSET"]["s1"]["mse"] == pytest.approx(results["DSET"]["s1"]["mse"])
    table_txt = open(result_file.replace(".txt", "_table.txt")).read()
    assert "Results on DSET" in table_txt and "Mean" in table_txt
    # the reference renders with header=False, so no column-name row;
    # sequence names appear as the first column
    assert "s1" in table_txt and "s2" in table_txt
    # skip-lock: a second run over the SAME datafiles must return {} without
    # re-evaluating (an empty file list would return {} even with the lock
    # deleted — pass the real list so the lock is what's exercised)
    mtime = os.path.getmtime(result_file)
    assert (
        evaluate_all(
            spec, ["DSET/s1.h5", "DSET/s2.h5"], str(tmp_path), result_file, cfg,
            progress=False,
        )
        == {}
    )
    assert os.path.getmtime(result_file) == mtime  # untouched


def test_p_loss_without_weights_raises(tmp_path, rng):
    _write_seq(tmp_path / "a.h5", rng)
    seq = load_sequence(str(tmp_path / "a.h5"), num_bins=5)
    spec = _make_spec("FireNet")
    cfg = EvalConfig(metrics=("p_loss",), subseq_L=None, max_length=None)
    with pytest.raises(ValueError, match="LPIPS"):
        evaluate_sequence(spec, seq, cfg)


def test_equalize_hist_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    from bde2vid_tpu.eval.driver import _equalize_hist

    img = rng.uniform(0, 1, (36, 44)).astype(np.float32)
    got = (_equalize_hist(img) * 255).round().astype(np.int32)
    want = cv2.equalizeHist((img * 255).clip(0, 255).astype(np.uint8)).astype(np.int32)
    assert (np.abs(got - want) <= 1).mean() > 0.999


def test_separate_polarity_eval(tmp_path, rng):
    """combined_voxel_channels=False feeds 2B-channel pos/neg voxels."""
    _write_seq(tmp_path / "a.h5", rng)
    seq = load_sequence(
        str(tmp_path / "a.h5"), num_bins=5, combined_voxel_channels=False
    )
    vox = np.asarray(seq.voxels(stop=2))
    assert vox.shape[1] == 10  # 2 * num_bins
    model = build_model(
        "FireNet", {"num_bins": 10, "base_num_channels": 8}
    )
    voxel = jnp.zeros((1, 64, 64, 10))
    params = model.init(jax.random.PRNGKey(0), voxel, model.initial_state(1, 64, 64))
    spec = ModelSpec("FireNet", model, params, num_bins=10, num_encoders=0)
    cfg = EvalConfig(
        num_bins=5, combined_voxel_channels=False,
        metrics=("mse",), subseq_L=None, max_length=None,
    )
    result, detail = evaluate_sequence(spec, seq, cfg)
    assert np.isfinite(result["mse"])
    assert len(detail["mse"]) == len(seq)


def test_pause_item_map_matches_reference_loop():
    """The reference pause loop (eval_models_seq.py:184-189) does NOT
    advance the dataloader during paused steps — it deep-copies the last
    real item with zeroed events, so the post-pause stream is DELAYED by
    the pause length. Simulate that loop literally and compare."""
    from bde2vid_tpu.eval.driver import _pause_item_map

    for T, st, ed in [(12, 2, 5), (10, 0, 3), (9, 4, 8), (20, 7, 7)]:
        want_idx, want_paused = [], []
        next_item = 0
        last = None
        for i in range(T):
            if i > st and i <= ed:
                want_idx.append(last)  # item_org: last real item
                want_paused.append(True)
            else:
                last = next_item
                next_item += 1
                want_idx.append(last)
                want_paused.append(False)
        got_idx, got_paused = _pause_item_map(T, st, ed)
        np.testing.assert_array_equal(got_idx, want_idx)
        np.testing.assert_array_equal(got_paused, want_paused)


def test_evaluate_sequence_pause_delays_stream(tmp_path, rng):
    """Pause runs for max_length steps and scores post-pause steps against
    the DELAYED ground-truth frames (reference semantics), consuming
    T - pause_len real items."""
    _write_seq(tmp_path / "a.h5", rng, num_frames=8)
    seq = load_sequence(str(tmp_path / "a.h5"), num_bins=5)
    spec = _make_spec()
    n_items = len(seq)
    pause_len = 3
    cfg = EvalConfig(
        metrics=("mse",),
        subseq_L=None,
        max_length=n_items + pause_len,
        pause_st=2,
        pause_ed=2 + pause_len,
    )
    result, detail = evaluate_sequence(spec, seq, cfg)
    # every step scored: T = max_length (reference T = args.max_length)
    assert len(detail["mse"]) == n_items + pause_len
    assert np.isfinite(result["mse"])
    # T is bounded by real-item availability (the reference would raise
    # StopIteration past len(seq) + pause_len)
    cfg_big = EvalConfig(
        metrics=("mse",), subseq_L=None, max_length=10_000, pause_st=2, pause_ed=5
    )
    _, detail_big = evaluate_sequence(spec, seq, cfg_big)
    assert len(detail_big["mse"]) == n_items + 3


def test_subseq_chunking_threads_state_for_step_models(tmp_path, rng):
    """subseq_L must NOT reset recurrent state for step models — the
    reference runs them as one per-step loop with state persisting for the
    whole sequence (eval_models_seq.py:169,209-213); only sequence models
    chunk-reset. Chunked metrics must equal unchunked exactly."""
    _write_seq(tmp_path / "a.h5", rng, num_frames=8)
    spec = _make_spec()  # E2VIDRecurrent: ConvLSTM state at every level
    cfg_full = EvalConfig(metrics=("mse",), subseq_L=None, max_length=None)
    _, d_full = evaluate_sequence(
        spec, load_sequence(str(tmp_path / "a.h5"), num_bins=5), cfg_full
    )
    cfg_chunk = EvalConfig(metrics=("mse",), subseq_L=2, max_length=None)
    _, d_chunk = evaluate_sequence(
        spec, load_sequence(str(tmp_path / "a.h5"), num_bins=5), cfg_chunk
    )
    np.testing.assert_allclose(d_chunk["mse"], d_full["mse"], rtol=1e-5, atol=1e-7)


def test_pause_bounds_validated(tmp_path, rng):
    _write_seq(tmp_path / "a.h5", rng, num_frames=6)
    spec = _make_spec()
    seq = load_sequence(str(tmp_path / "a.h5"), num_bins=5)
    with pytest.raises(ValueError, match="pause_ed"):
        evaluate_sequence(spec, seq, EvalConfig(
            metrics=("mse",), subseq_L=None, max_length=None,
            pause_st=4, pause_ed=2))
    with pytest.raises(ValueError, match="beyond the sequence"):
        evaluate_sequence(spec, seq, EvalConfig(
            metrics=("mse",), subseq_L=None, max_length=None,
            pause_st=150, pause_ed=160))


def test_u8_ground_truth_fast_path(tmp_path, rng):
    """The uint8 ground-truth upload path (driver ships stored bytes and
    scales on device): frames_u8 returns the exact stored frames, the
    device u8/255 matches the host float64 conversion to 1 ulp, and the
    driver's metrics match a forced float32-upload run."""
    from bde2vid_tpu.eval.driver import _u8_to_unit

    _write_seq(tmp_path / "a.h5", rng, num_frames=6)
    seq = load_sequence(str(tmp_path / "a.h5"), num_bins=5)

    u8 = seq.frames_u8(0, len(seq))
    assert u8 is not None and u8.dtype == np.uint8
    np.testing.assert_array_equal(
        seq.frames(0, len(seq)), (u8 / 255.0).astype(np.float32)
    )

    # device scaling: f32 divide is correctly rounded; the host path
    # double-rounds through f64 — equal to within 1 ulp on all 256 values
    all_vals = np.arange(256, dtype=np.uint8)
    dev = np.asarray(_u8_to_unit(jnp.asarray(all_vals)))
    host = (all_vals / 255.0).astype(np.float32)
    assert np.abs(dev - host).max() <= 6e-8

    spec = _make_spec()
    cfg = EvalConfig(metrics=("mse", "ssim"), subseq_L=None, max_length=None)
    res_u8, _ = evaluate_sequence(spec, seq, cfg)

    # force the float32 fallback (what non-u8 backends get) and compare
    seq2 = load_sequence(str(tmp_path / "a.h5"), num_bins=5)
    seq2.frames_u8 = lambda a, b: None
    res_f32, _ = evaluate_sequence(spec, seq2, cfg)
    for k in res_u8:
        assert res_u8[k] == pytest.approx(res_f32[k], rel=1e-5, abs=1e-7)
