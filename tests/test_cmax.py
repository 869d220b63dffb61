"""Contrast maximization tests: recover a known linear velocity."""

import numpy as np
import pytest

import jax.numpy as jnp

from bde2vid_tpu.events.cmax import (
    OBJECTIVES,
    gaussian_blur,
    get_iwe,
    linvel_warp,
    optimize_contrast,
)
from bde2vid_tpu.events.voxel import pad_events

SENSOR = (64, 64)


def _moving_dot_events(rng, vx=20.0, vy=-12.0, n_per=40, steps=50):
    """A cluster of pixels translating at (vx, vy) px/s over 1 second."""
    xs, ys, ts = [], [], []
    base_x = rng.integers(20, 36, n_per)
    base_y = rng.integers(24, 40, n_per)
    for i in range(steps):
        t = i / (steps - 1)
        xs.append(np.clip(base_x + vx * t + rng.normal(0, 0.2, n_per), 0, 63))
        ys.append(np.clip(base_y + vy * t + rng.normal(0, 0.2, n_per), 0, 63))
        ts.append(np.full(n_per, t))
    xs = np.concatenate(xs).astype(np.float32)
    ys = np.concatenate(ys).astype(np.float32)
    ts = np.concatenate(ts).astype(np.float32)
    ps = np.ones_like(ts)
    order = np.argsort(ts, kind="stable")
    return xs[order], ys[order], ts[order], ps[order]


def test_linvel_warp_compensates_motion():
    xs = jnp.asarray([10.0, 20.0])
    ys = jnp.asarray([5.0, 15.0])
    ts = jnp.asarray([0.0, 1.0])
    wx, wy = linvel_warp(xs, ys, ts, jnp.asarray([10.0, 10.0]))
    np.testing.assert_allclose(np.asarray(wx), [10.0, 10.0])
    np.testing.assert_allclose(np.asarray(wy), [5.0, 5.0])


def test_gaussian_blur_preserves_mass(rng):
    img = jnp.asarray(rng.uniform(0, 1, SENSOR).astype(np.float32))
    blurred = gaussian_blur(img, 2.0)
    assert float(jnp.sum(blurred)) == pytest.approx(float(jnp.sum(img)), rel=0.02)


def test_iwe_sharper_at_true_velocity(rng):
    xs, ys, ts, ps = _moving_dot_events(rng)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    var = {}
    for name, params in [("true", (20.0, -12.0)), ("zero", (0.0, 0.0))]:
        iwe = get_iwe(jnp.asarray(params), px, py, pt, pp, n, img_size=SENSOR)
        var[name] = float(jnp.var(iwe))
    assert var["true"] > 2 * var["zero"]  # motion-compensated image is sharper


def test_optimize_recovers_velocity(rng):
    xs, ys, ts, ps = _moving_dot_events(rng)
    est = optimize_contrast(
        xs, ys, ts, ps, objective="variance", img_size=SENSOR, blur_sigma=2.0,
        x0=np.array([15.0, -8.0]),
    )
    assert est[0] == pytest.approx(20.0, abs=2.0)
    assert est[1] == pytest.approx(-12.0, abs=2.0)


def test_all_objectives_finite(rng):
    xs, ys, ts, ps = _moving_dot_events(rng)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    iwe = get_iwe(jnp.asarray([5.0, 5.0]), px, py, pt, pp, n, img_size=SENSOR)
    for name, fn in OBJECTIVES.items():
        assert np.isfinite(float(fn(iwe))), name


def test_analytic_derivative_matches_autodiff(rng):
    """The reference's analytic derivative-image chain and our autodiff IWE
    gradient must agree: d(sum(iwe^2))/d(params) computed both ways."""
    import jax

    from bde2vid_tpu.events.cmax import get_iwe_drv

    xs, ys, ts, ps = _moving_dot_events(rng)
    # keep warped events well inside the default (180,240) raster that the
    # analytic chain uses, so both paths see identical masks
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    params = jnp.asarray([5.0, 3.0])

    iwe, d_iwe = get_iwe_drv(params, px, py, pt, pp, n, img_size=(180, 240))
    analytic = 2.0 * jnp.sum(iwe[None] * d_iwe, axis=(1, 2))

    def loss(p):
        # same chain as get_iwe_drv but without the jacobian planes
        return jnp.sum(
            get_iwe_drv(p, px, py, pt, pp, n, img_size=(180, 240))[0] ** 2
        )

    auto = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(analytic), rtol=1e-3)


def test_iwe_drv_rasterizes_at_img_size(rng):
    """get_iwe_drv must make the SAME raster-size choice as get_iwe at a
    non-default sensor (r3 review: it previously rasterized at the
    hardcoded (180,240) default, so the advertised analytic-vs-autodiff
    cross-check only held at one sensor size)."""
    import jax

    from bde2vid_tpu.events.cmax import get_iwe_drv

    xs, ys, ts, ps = _moving_dot_events(rng)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    params = jnp.asarray([5.0, 3.0])

    iwe_ref = get_iwe(params, px, py, pt, pp, n, img_size=SENSOR)
    iwe, d_iwe = get_iwe_drv(params, px, py, pt, pp, n, img_size=SENSOR)
    assert iwe.shape == iwe_ref.shape  # same (sensor+pad) raster
    np.testing.assert_allclose(np.asarray(iwe), np.asarray(iwe_ref), atol=1e-5)

    analytic = 2.0 * jnp.sum(iwe[None] * d_iwe, axis=(1, 2))
    auto = jax.grad(
        lambda p: jnp.sum(get_iwe(p, px, py, pt, pp, n, img_size=SENSOR) ** 2)
    )(params)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(analytic), rtol=1e-3)


def test_zhu_objective_minimized_near_true_velocity(rng):
    """The zhu timestamp objective should score the true velocity better
    than a wrong one, and optimize end-to-end through autodiff."""
    from bde2vid_tpu.events.cmax import zhu_timestamp_objective

    xs, ys, ts, ps = _moving_dot_events(rng)
    px, py, pt, pp, n = pad_events(xs, ys, ts, ps)
    at_true = float(
        zhu_timestamp_objective(jnp.asarray([20.0, -12.0]), px, py, pt, pp, n)
    )
    at_zero = float(
        zhu_timestamp_objective(jnp.asarray([0.0, 0.0]), px, py, pt, pp, n)
    )
    assert at_true < at_zero  # objective is a negative score

    est = optimize_contrast(
        xs, ys, ts, ps, objective="zhu", blur_sigma=2.0,
        x0=np.array([15.0, -8.0]),
    )
    assert est[0] == pytest.approx(20.0, abs=3.0)
    assert est[1] == pytest.approx(-12.0, abs=3.0)
