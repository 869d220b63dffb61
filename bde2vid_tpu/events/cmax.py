"""Contrast maximization: warp models, IWE objectives, optimizer loop.

Reference: events_contrast_maximization/utils/{events_cmax.py:47-120,
objectives.py:56-438, warps.py:20-37}. A standalone research utility (not on
the eval path) for motion estimation by maximizing the contrast of the image
of warped events (IWE).

TPU-native redesign: warps and objectives are differentiable JAX functions,
so gradients come from autodiff instead of the reference's hand-derived /
numeric derivatives; the scipy BFGS driver consumes jitted value-and-grad.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bde2vid_tpu.events.voxel import (
    events_to_image_bilinear,
    events_to_image_drv,
    events_to_timestamp_image,
)

Array = jax.Array


# ---------------------------------- warps ------------------------------------


def linvel_warp(xs: Array, ys: Array, ts: Array, params: Array, t0: float = 0.0):
    """Linear-velocity (global optic flow) warp: p' = p - dt * v
    (reference warps.py:20-37). params = (vx, vy)."""
    dt = ts - t0
    return xs - dt * params[0], ys - dt * params[1]


def linvel_warp_jacobian(ts: Array, t0: float = 0.0) -> Tuple[Array, Array]:
    """(jx, jy), each (2, N): d(warped coord)/d(param) for the linvel warp
    (reference warps.py:32-36: jacobian_x[0] = jacobian_y[1] = -dt)."""
    dt = ts - t0
    zeros = jnp.zeros_like(dt)
    return jnp.stack([-dt, zeros]), jnp.stack([zeros, -dt])


LINVEL_DIMS = 2


def events_bounds_mask(
    xs: Array, ys: Array, x_min, x_max, y_min, y_max
) -> Array:
    """1.0 for events strictly inside (min, max] on both axes — the
    reference's open-at-min / closed-at-max convention
    (event_utils.py:141-147)."""
    keep_x = jnp.logical_not(jnp.logical_or(xs <= x_min, xs > x_max))
    keep_y = jnp.logical_not(jnp.logical_or(ys <= y_min, ys > y_max))
    return (keep_x & keep_y).astype(jnp.float32)


# -------------------------------- IWE ----------------------------------------


def gaussian_blur(img: Array, sigma: Optional[float]) -> Array:
    """Separable Gaussian blur (scipy gaussian_filter equivalent, truncate=4)."""
    if sigma is None or sigma <= 0:
        return img
    radius = int(4.0 * sigma + 0.5)
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / jnp.sum(k)
    # scipy gaussian_filter default boundary mode is 'reflect' (== numpy
    # 'symmetric'): pad first, then VALID convolve
    img = jnp.pad(img, ((radius, radius), (radius, radius)), mode="symmetric")
    img = img[None, :, :, None]
    kh = k.reshape(-1, 1, 1, 1)
    kw = k.reshape(1, -1, 1, 1)
    # HIGHEST precision: at the TPU default the MXU multiplies in bf16,
    # whose ~1e-3 relative noise swamps the ~1e-4 function deltas BFGS's
    # Wolfe line search probes — observed as "precision loss" at iteration
    # 0 on chip while CPU converged; full-f32 conv restores convergence
    img = jax.lax.conv_general_dilated(
        img, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    img = jax.lax.conv_general_dilated(
        img, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return img[0, :, :, 0]


@functools.partial(jax.jit, static_argnames=("img_size", "use_polarity", "blur_sigma"))
def get_iwe(
    params: Array,
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    n_events,
    img_size: Tuple[int, int] = (180, 240),
    use_polarity: bool = True,
    blur_sigma: Optional[float] = None,
) -> Array:
    """Image of warped events under the linvel warp (objectives.py:56-71).

    The reference warps to the LAST timestamp's frame (get_iwe passes
    t0=ts[-1], :63); pad_events fills the tail with the last valid
    timestamp, so ts[-1] is correct for padded buffers too. Events warped
    outside (0, img_size] are dropped via events_bounds_mask BEFORE the
    raster, exactly like the reference (:65-66) — note its open-at-min
    convention drops x==0 / y==0 events, which the raster's own clip would
    have kept. One deliberate divergence: the raster runs at img_size
    (the reference always rasterizes at the default (180, 240) regardless
    of img_size — meaningless for other sensors)."""
    wx, wy = linvel_warp(
        xs.astype(jnp.float32), ys.astype(jnp.float32), ts, params, t0=ts[-1]
    )
    weights = ps if use_polarity else jnp.abs(ps)
    mask = events_bounds_mask(wx, wy, 0, img_size[1], 0, img_size[0])
    wx, wy, weights = wx * mask, wy * mask, weights * mask
    iwe = events_to_image_bilinear(wx, wy, weights, n_events, sensor_size=img_size)
    return gaussian_blur(iwe, blur_sigma)


@functools.partial(jax.jit, static_argnames=("img_size", "use_polarity", "blur_sigma"))
def get_iwe_drv(
    params: Array,
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    n_events,
    img_size: Tuple[int, int] = (180, 240),
    use_polarity: bool = True,
    blur_sigma: Optional[float] = None,
) -> Tuple[Array, Array]:
    """IWE plus its ANALYTIC derivative image wrt the linvel warp params.

    Mirrors the reference get_iwe(..., compute_gradient=True) chain
    (objectives.py:57-71): warp to ts[-1] with jacobians, zero out-of-bounds
    events/coords/jacobians via events_bounds_mask, then the double-weighted
    bilinear scatter (event_utils.py:186-249). The reference always
    rasterizes at its hardcoded (180, 240) default; like get_iwe above we
    deliberately rasterize at img_size instead (the fixed-size raster is
    meaningless for other sensors), so the two functions stay cross-checkable
    at ANY sensor size. Autodiff through get_iwe is the optimization path —
    this exists for parity and as a numerical cross-check of those autodiff
    gradients (tests/test_cmax.py)."""
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    wx, wy = linvel_warp(xs, ys, ts, params, t0=ts[-1])
    jx, jy = linvel_warp_jacobian(ts, t0=ts[-1])
    weights = ps if use_polarity else jnp.abs(ps)
    mask = events_bounds_mask(wx, wy, 0, img_size[1], 0, img_size[0])
    wx, wy, weights = wx * mask, wy * mask, weights * mask
    jx, jy = jx * mask, jy * mask
    iwe, d_iwe = events_to_image_drv(
        wx, wy, weights, jx, jy, n_events, sensor_size=img_size
    )
    if blur_sigma is not None and blur_sigma > 0:
        iwe = gaussian_blur(iwe, blur_sigma)
        d_iwe = jax.vmap(lambda im: gaussian_blur(im, blur_sigma))(d_iwe)
    return iwe, d_iwe


# ------------------------------ objectives -----------------------------------


def variance_objective(iwe: Array) -> Array:
    """Negative variance of the IWE (Gallego'18; objectives.py:73-113)."""
    return -jnp.var(iwe)


def rms_objective(iwe: Array) -> Array:
    """Negative 'RMS' (objectives.py:115-138). NOTE the reference computes
    np.linalg.norm(iwe, 2) on the 2-D image — the SPECTRAL norm (largest
    singular value), not Frobenius; almost certainly unintended upstream
    (its own gradient assumes Frobenius) but kept for value parity."""
    s = jnp.linalg.norm(iwe, 2)
    return -(s * s) / (iwe.shape[0] * iwe.shape[1])


def sos_objective(iwe: Array) -> Array:
    """Negative sum of squares (Stoffregen'19; objectives.py:157-198)."""
    return -jnp.mean(iwe**2)


def soe_objective(iwe: Array) -> Array:
    """Negative sum of exponentials (objectives.py:200-241)."""
    return -jnp.mean(jnp.exp(iwe))


def moa_objective(iwe: Array) -> Array:
    """Negative max of accumulations (objectives.py:243-271)."""
    return -jnp.max(iwe)


def isoa_objective(iwe: Array, thresh: float = 0.5) -> Array:
    """Inverse sum of (soft) suprathreshold accumulations (objectives.py:273-318).
    The reference counts pixels above a threshold; a sigmoid relaxation keeps
    it differentiable for the gradient path."""
    return jnp.sum(jax.nn.sigmoid((iwe - thresh) * 50.0))


def sosa_objective(iwe: Array, p: float = 3.0) -> Array:
    """Sum of Suppressed Accumulations (Stoffregen CVPR'19;
    objectives.py:320-345: sum of exp(-p * iwe) — the raw IWE, not its
    absolute value; used with use_polarity=False so iwe >= 0)."""
    return -jnp.sum(jnp.exp(-p * iwe))


OBJECTIVES = {
    "variance": variance_objective,
    "rms": rms_objective,
    "sos": sos_objective,
    "soe": soe_objective,
    "moa": moa_objective,
    "isoa": isoa_objective,
    "sosa": sosa_objective,
}


@functools.partial(jax.jit, static_argnames=("img_size", "blur_sigma"))
def zhu_timestamp_objective(
    params: Array,
    xs: Array,
    ys: Array,
    ts: Array,
    ps: Array,
    n_events,
    img_size: Tuple[int, int] = (180, 240),
    blur_sigma: Optional[float] = 2.0,
) -> Array:
    """Squared average-timestamp-image objective (Zhu CVPR'19; reference
    objectives.py:366-400): warp to ts[-1], zero out-of-bounds events (coords,
    ts AND polarity — so masked events join the <=0-polarity NEG image at
    pixel (0,0), a reference quirk kept for parity), build per-polarity
    timestamp images, blur (default sigma 2.0), and return
    ``-(sum(pos^2) + sum(neg^2))``.

    The reference rasterizes its timestamp images at the hardcoded
    (180, 240) default regardless of img_size (it passes no sensor_size
    through, objectives.py:387); like get_iwe we deliberately rasterize at
    img_size so non-default sensors get a meaningful objective.
    ``blur_sigma=None`` substitutes the zhu default 2.0 (objectives.py:388)
    — pass 0 to disable blurring. The reference declares this objective
    derivative-free; here autodiff supplies the gradient, so it plugs into
    optimize_contrast like any other objective."""
    if blur_sigma is None:
        blur_sigma = 2.0
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    wx, wy = linvel_warp(xs, ys, ts, params, t0=ts[-1])
    mask = events_bounds_mask(wx, wy, 0, img_size[1], 0, img_size[0])
    wx, wy = wx * mask, wy * mask
    mts, mps = ts * mask, ps * mask
    img_pos, img_neg = events_to_timestamp_image(
        wx, wy, mts, mps, n_events, sensor_size=img_size
    )
    if blur_sigma is not None and blur_sigma > 0:
        img_pos = gaussian_blur(img_pos, blur_sigma)
        img_neg = gaussian_blur(img_neg, blur_sigma)
    return -(jnp.sum(img_pos * img_pos) + jnp.sum(img_neg * img_neg))


# ------------------------------ optimization ---------------------------------


@functools.lru_cache(maxsize=32)
def _cached_value_and_grad(objective, img_size, use_polarity, blur_sigma):
    """One jitted objective value+grad per configuration. Event buffers are
    jit ARGUMENTS: a per-call closure would embed them as compile-time
    constants, recompiling for every window and defeating pad_events'
    power-of-two capacity bucketing."""
    if objective == "zhu":
        # full-chain objective (needs events, not just the IWE). Two
        # reference behaviors preserved (objectives.py:366-393): blur_sigma
        # None substitutes zhu's default_blur=2.0 (unlike the repo-wide
        # None-means-no-blur convention — pass 0 to disable), and
        # use_polarity is IGNORED (zhu splits on raw polarity itself; its
        # evaluate_function never routes through get_iwe's abs()).
        if not use_polarity:
            raise ValueError(
                "the zhu objective ignores use_polarity (it splits events "
                "by raw polarity); pass use_polarity=True"
            )
        zhu_sigma = 2.0 if blur_sigma is None else blur_sigma

        @jax.jit
        def zhu_value_and_grad(params, px, py, pt, pp, n):
            def f(p):
                return zhu_timestamp_objective(
                    p, px, py, pt, pp, n, img_size=img_size, blur_sigma=zhu_sigma
                )

            return jax.value_and_grad(f)(params)

        return zhu_value_and_grad
    obj_fn = OBJECTIVES[objective]

    @jax.jit
    def value_and_grad(params, px, py, pt, pp, n):
        def f(p):
            iwe = get_iwe(
                p, px, py, pt, pp, n, img_size=img_size,
                use_polarity=use_polarity, blur_sigma=blur_sigma,
            )
            return obj_fn(iwe)

        return jax.value_and_grad(f)(params)

    return value_and_grad


def optimize_contrast(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    objective: str = "variance",
    x0: Optional[np.ndarray] = None,
    img_size: Tuple[int, int] = (180, 240),
    blur_sigma: Optional[float] = 1.0,
    use_polarity: bool = True,
) -> np.ndarray:
    """BFGS over warp params (reference optimize_contrast :47-77), with
    autodiff gradients. Returns the argmax warp parameters."""
    import scipy.optimize as opt

    from bde2vid_tpu.events.voxel import pad_events

    px, py, pt, pp, n = pad_events(
        xs.astype(np.float32), ys.astype(np.float32), ts, ps
    )
    value_and_grad = _cached_value_and_grad(
        objective, tuple(img_size), use_polarity, blur_sigma
    )

    def f_np(p):
        v, _ = value_and_grad(jnp.asarray(p, jnp.float32), px, py, pt, pp, n)
        return float(v)

    def g_np(p):
        _, g = value_and_grad(jnp.asarray(p, jnp.float32), px, py, pt, pp, n)
        return np.asarray(g, np.float64)

    x0 = np.zeros(LINVEL_DIMS) if x0 is None else np.asarray(x0, np.float64)
    return opt.fmin_bfgs(f_np, x0, fprime=g_np, disp=False)


def optimize_r2(xs, ys, ts, ps, objective: str = "sos", **kw) -> np.ndarray:
    """Two-stage schedule finishing with SoE at blur 1.0 (reference :102-120)."""
    argmax = optimize_contrast(xs, ys, ts, ps, objective=objective, blur_sigma=None, **kw)
    return optimize_contrast(
        xs, ys, ts, ps, objective="soe", x0=argmax, blur_sigma=1.0, **kw
    )
