"""LPIPS against the REAL vendored v0.1 lin-head weights.

The reference builds its p_loss metric from LPIPS/weights/v0.1/alex.pth
(dist_model.py:30-163); these tests run our converter and metric on that
actual file (not random stand-ins)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bde2vid_tpu.metrics.lpips import (
    ALEX_CHNS,
    LPIPS,
    find_default_lpips_lin,
    load_lpips_params,
    lpips_distance,
)

VENDORED = "/root/reference/LPIPS/weights/v0.1/alex.pth"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(VENDORED), reason="vendored lin weights not present"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def real_params():
    sd = {k: v.numpy() for k, v in torch.load(VENDORED, map_location="cpu").items()}
    return load_lpips_params(sd), sd


def test_find_default_lpips_lin_discovers_vendored_file():
    found = find_default_lpips_lin("alex")
    assert found is not None and os.path.isfile(found)


def test_real_lin_weights_convert_with_expected_shapes(real_params):
    params, sd = real_params
    assert sorted(sd) == [f"lin{k}.model.1.weight" for k in range(5)]
    for k, c in enumerate(ALEX_CHNS):
        lin = np.asarray(params["params"][f"lin{k}"])
        assert lin.shape == (c,)
        np.testing.assert_allclose(
            lin, np.asarray(sd[f"lin{k}.model.1.weight"]).reshape(-1), atol=0
        )
        # v0.1 lin heads are trained with a non-negativity clamp
        assert lin.min() >= 0.0, f"lin{k} has negative weights"
        assert lin.max() > 0.0 and np.isfinite(lin).all()


def test_real_weights_metric_properties(real_params):
    params, _ = real_params
    module = LPIPS(net="alex")
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))

    d_same = float(lpips_distance(module, params, a, a))
    assert abs(d_same) < 1e-6  # identical inputs -> zero distance

    small = a + 0.02 * jnp.asarray(rng.normal(size=a.shape).astype(np.float32))
    large = a + 0.3 * jnp.asarray(rng.normal(size=a.shape).astype(np.float32))
    d_small = float(lpips_distance(module, params, a, jnp.clip(small, 0, 1)))
    d_large = float(lpips_distance(module, params, a, jnp.clip(large, 0, 1)))
    assert 0.0 < d_small < d_large  # monotone in perturbation size

    # deterministic across calls
    d_again = float(lpips_distance(module, params, a, jnp.clip(small, 0, 1)))
    np.testing.assert_allclose(d_small, d_again, rtol=0, atol=0)


def test_cli_eval_produces_full_metric_triple(tmp_path, real_params):
    """One CLI eval run with the reference's default metric set
    (p_loss, mse, ssim), the lin weights auto-discovered."""
    import json

    import jax.numpy as jnp

    from bde2vid_tpu.eval.__main__ import main
    from bde2vid_tpu.events import H5EventWriter
    from bde2vid_tpu.models import build_model
    from bde2vid_tpu.train.trainer import save_checkpoint
    from tests.conftest import make_events

    sensor = (36, 44)
    cfg = {
        "num_bins": 5,
        "num_encoders": 2,
        "base_num_channels": 8,
        "num_residual_blocks": 1,
    }
    rng = np.random.default_rng(9)
    dset = tmp_path / "data" / "h5" / "DSET"
    os.makedirs(dset)
    xs, ys, ts, ps = make_events(rng, n=12000, sensor_size=sensor, t1=1.0)
    with H5EventWriter(str(dset / "s1.h5"), sensor_size=sensor) as w:
        w.append_events(xs, ys, ts, ps > 0)
        for i in range(6):
            w.add_image(rng.uniform(0, 255, sensor).astype(np.uint8), (i + 0.5) / 6)

    model = build_model("E2VIDRecurrent", cfg)
    voxel = jnp.zeros((1, 64, 64, 5))
    params = model.init(jax.random.PRNGKey(0), voxel, model.initial_state(1, 64, 64))
    wdir = tmp_path / "weights"
    os.makedirs(wdir)
    save_checkpoint(str(wdir / "model.msgpack"), params, "E2VIDRecurrent", cfg)

    rc = main(
        [
            "--weights_dir", str(wdir),
            "--data_dir", str(tmp_path / "data"),
            "--datasets", "DSET/",
            "--metrics", "p_loss", "mse", "ssim",
        ]
    )
    assert rc == 0
    result_files = [f for f in os.listdir(wdir) if f.endswith("_org.txt")]
    assert result_files, os.listdir(wdir)
    with open(wdir / result_files[0]) as fp:
        results = json.load(fp)
    triple = results["DSET"]["s1"]
    assert set(triple) >= {"p_loss", "mse", "ssim"}
    for v in triple.values():
        assert np.isfinite(v)
    assert triple["p_loss"] > 0


def test_metric_batch_not_stale_across_params(real_params):
    """Regression: the p_loss jit cache must key on the module and take
    params as an argument — swapping weight trees must change the result
    (an id(params)-keyed cache could serve a stale closure)."""
    from bde2vid_tpu.eval.driver import _metric_batch

    params, _ = real_params
    module = LPIPS(net="alex")
    rng = np.random.default_rng(5)
    preds = jnp.asarray(rng.uniform(size=(2, 64, 64)).astype(np.float32))
    gts = jnp.asarray(rng.uniform(size=(2, 64, 64)).astype(np.float32))

    out_real = _metric_batch(preds, gts, ("p_loss",), (module, params))
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    out_zero = _metric_batch(preds, gts, ("p_loss",), (module, zeroed))
    assert np.all(out_real["p_loss"] > 0)
    np.testing.assert_allclose(out_zero["p_loss"], 0.0, atol=1e-7)
