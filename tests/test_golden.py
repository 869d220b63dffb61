"""Golden-metric regression test (SURVEY §4(c)).

The reference's de-facto integration test is golden numbers from a
deterministic eval run. This pins the full pipeline (h5 write/read ->
windowing -> device voxelization -> padded scan forward -> crop -> metrics)
to values computed at framework build time with fixed seeds. A drift here
means a silent numeric change somewhere in the stack.
"""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bde2vid_tpu.data import load_sequence
from bde2vid_tpu.eval import EvalConfig, evaluate_sequence
from bde2vid_tpu.events import H5EventWriter
from bde2vid_tpu.models import build_model
from bde2vid_tpu.models.api import ModelSpec
from tests.conftest import make_events

SENSOR = (36, 44)
GOLDEN = {"mse": 0.08551601320505142, "ssim": 0.04388384893536568}


def _golden_seq(tmp_path, ltype="H5"):
    """THE golden fixture: every golden in this file is pinned against this
    exact seeded byte stream — one copy only (divergent copies would
    silently desynchronize the pinned numbers)."""
    rng = np.random.default_rng(1234)
    xs, ys, ts, ps = make_events(rng, n=12000, sensor_size=SENSOR, t1=1.0)
    path = str(tmp_path / "g.h5")
    with H5EventWriter(path, sensor_size=SENSOR) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(6):
            w.add_image(rng.integers(0, 255, SENSOR).astype(np.uint8), (i + 0.5) / 6)
    return load_sequence(path, num_bins=5, ltype=ltype)


def test_golden_eval_metrics(tmp_path):
    seq = _golden_seq(tmp_path)
    model = build_model(
        "E2VIDRecurrent",
        {"num_bins": 5, "num_encoders": 2, "base_num_channels": 8,
         "num_residual_blocks": 1},
    )
    params = model.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 5)), model.initial_state(1, 64, 64)
    )
    spec = ModelSpec("E2VIDRecurrent", model, params, 5, 2)
    result, _ = evaluate_sequence(
        spec, seq, EvalConfig(metrics=("mse", "ssim"), subseq_L=None, max_length=None)
    )
    assert result["mse"] == pytest.approx(GOLDEN["mse"], rel=1e-4)
    assert result["ssim"] == pytest.approx(GOLDEN["ssim"], rel=1e-4)


GOLDEN_BDE2VID = {"mse": 0.08264881372451782, "ssim": 0.04553176090121269}
BDE2VID_CFG = {
    "generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                  "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                  "depths": [1, 1], "num_heads": 2, "window_size": [4, 4]}
}


@pytest.mark.parametrize("use_pallas", [False, True])
def test_golden_bde2vid(tmp_path, use_pallas):
    """Flagship-family golden incl. the fused Pallas attention path
    (interpret mode on CPU) — kernel regressions change these numbers."""
    seq = _golden_seq(tmp_path)
    cfg = {"generator": dict(BDE2VID_CFG["generator"])}
    cfg["generator"]["use_pallas_attention"] = use_pallas
    model = build_model("BDE2VID", cfg)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((2, 1, 16, 16, 5)))
    spec = ModelSpec("BDE2VID", model, params, 5, 2, is_sequence_model=True)
    result, _ = evaluate_sequence(
        spec, seq, EvalConfig(metrics=("mse", "ssim"), subseq_L=None, max_length=None)
    )
    assert result["mse"] == pytest.approx(GOLDEN_BDE2VID["mse"], rel=2e-4)
    assert result["ssim"] == pytest.approx(GOLDEN_BDE2VID["ssim"], rel=2e-3)


FAMILY_GOLDEN = {
    # (config, ltype, robust_norm_output) -> pinned metrics
    "SPADEE2VID": ({}, "SpadeH5", False,
                   {"mse": 0.08274436742067337, "ssim": 0.04303765296936035}),
    "EITR": ({"num_bins": 5, "d_model": 32, "dim_feedforward": 64, "nhead": 4,
              "channels": [8, 16, 32, 32]}, "H5", False,
             {"mse": 0.08914687484502792, "ssim": 0.03080364502966404}),
    # re-pinned after the SNN input norm switched to the reference runner's
    # unbiased std (rec_snn_forward.py:34 tensor.std(), not LegacyNorm)
    "EVSNN": ({"num_bins": 5}, "H5", True,
              {"mse": 0.1739780455827713, "ssim": 0.023991256952285767}),
}


@pytest.mark.parametrize("name", sorted(FAMILY_GOLDEN))
def test_golden_per_family(tmp_path, name):
    """Per-family numeric anchors through the full pipeline (incl. the
    SPADE ev_rate path and the SNN robust-norm postprocessing)."""
    cfg, ltype, robust, golden = FAMILY_GOLDEN[name]
    seq = _golden_seq(tmp_path, ltype=ltype)
    model = build_model(name, cfg)
    st = model.initial_state(1, 64, 64)
    params = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 5)), st)
    spec = ModelSpec(name, model, params, 5, 3)
    result, _ = evaluate_sequence(
        spec, seq,
        EvalConfig(metrics=("mse", "ssim"), subseq_L=None, max_length=None,
                   robust_norm_output=robust),
    )
    assert result["mse"] == pytest.approx(golden["mse"], rel=1e-4)
    assert result["ssim"] == pytest.approx(golden["ssim"], rel=1e-3)
