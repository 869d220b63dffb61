"""MSE and SSIM (skimage-compatible) as pure JAX functions.

SSIM follows the exact skimage.metrics.structural_similarity algorithm with
its defaults as invoked by the reference (evaluate/metrics.py:46-65, no
kwargs): uniform 7x7 window, K1=0.01, K2=0.03, sample-covariance correction
NP/(NP-1), valid-window cropping, and — crucially — ``data_range=2.0``:
skimage infers the range from the dtype, and for float images that is the
[-1, 1] span, i.e. 2.0, even though the reference feeds [0, 1] images. That
quirk is part of the published protocol, so it is the default here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def mse(pred: Array, target: Array) -> Array:
    """Mean squared error over all elements (== F.mse_loss)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def _uniform_filter_valid(x: Array, win: int) -> Array:
    """Mean over win x win windows, valid positions only. x: (H, W).

    Separable shifted-slice adds, not a conv: a single-channel NHWC conv
    wastes 127/128 of the TPU's vector lanes (C=1 pads to a full lane
    tile) and runs its multiplies at the MXU's default (bf16) precision —
    measured ~3e-3 per-frame SSIM error on chip. 2*(win-1) exact f32 adds
    on (H, W) arrays keep W in the lane dimension: 1.6x faster batched
    (37 vs 60 us/frame at 180x240) and exact — on-chip SSIM matches the
    NumPy oracle to ~3e-8 (see docs/BENCHMARKS.md)."""
    h, w = x.shape[-2], x.shape[-1]
    rows = x[..., : h - win + 1, :]
    for i in range(1, win):
        rows = rows + x[..., i : h - win + 1 + i, :]
    out = rows[..., : w - win + 1]
    for i in range(1, win):
        out = out + rows[..., i : w - win + 1 + i]
    return out * (1.0 / (win * win))


@functools.partial(jax.jit, static_argnames=("win_size",))
def _ssim_single(im1: Array, im2: Array, data_range: Array, win_size: int = 7) -> Array:
    """SSIM of a single-channel (H, W) pair, skimage algorithm."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)  # sample covariance (skimage default)

    ux = _uniform_filter_valid(im1, win_size)
    uy = _uniform_filter_valid(im2, win_size)
    uxx = _uniform_filter_valid(im1 * im1, win_size)
    uyy = _uniform_filter_valid(im2 * im2, win_size)
    uxy = _uniform_filter_valid(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # valid conv already restricts to fully-interior windows == skimage's
    # crop of the (win_size-1)/2 border after its padded filtering
    return jnp.mean(s)


def structural_similarity(
    pred: Array,
    target: Array,
    data_range: float = 2.0,
    win_size: int = 7,
) -> Array:
    """Batch SSIM matching the reference wrapper (evaluate/metrics.py:46-65).

    pred/target: (N, H, W, C) with C == 1 or 3. Multichannel images average
    SSIM over channels (skimage ``multichannel=True``); the batch is averaged.
    """
    if pred.ndim != 4:
        raise ValueError(f"expected NHWC, got shape {pred.shape}")
    dr = jnp.asarray(data_range, jnp.float32)
    per_channel = jax.vmap(
        jax.vmap(lambda a, b: _ssim_single(a, b, dr, win_size), in_axes=(-1, -1)),
        in_axes=(0, 0),
    )(pred, target)  # (N, C)
    return jnp.mean(per_channel)


class MseMetric:
    """Streaming length-weighted MSE aggregator (reference mmengine Mse
    Metric, evaluate/metrics.py:14-39): per-call mean MSE weighted by the
    number of steps, reduced to one value."""

    def __init__(self, prefix: str = "MSE"):
        self.prefix = prefix
        self.results = []

    def process(self, preds: Array, gts: Array, seq_name: str = "unknown", dataset: str = "unknown"):
        l = preds.shape[0]
        self.results.append(
            {self.prefix: float(mse(preds, gts)), "L": l, "seq_name": seq_name, "dataset": dataset}
        )

    def compute_metrics(self):
        total = sum(r[self.prefix] * r["L"] for r in self.results)
        n = sum(r["L"] for r in self.results)
        return {self.prefix: total / max(n, 1)}


def psnr(pred: Array, target: Array, peak: float = 1.0) -> Array:
    """Peak signal-to-noise ratio (vendored LPIPS util.psnr :52-53; peak
    defaults to 1.0 for the framework's [0,1] float images). Not part of
    the reference driver's metric triple — offered as an extra."""
    m = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(peak**2 / jnp.maximum(m, 1e-12))
