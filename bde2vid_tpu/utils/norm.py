"""Normalization transforms (JAX, jittable).

Reference: utils_func/data_augmentation.py RobustNorm :30-68 (percentile
clamp + min/max rescale with nearest-rank percentiles) and LegacyNorm
:313-330 (zero-mean/unit-std over NONZERO voxel entries only, preserving
zeros), utils_func/utils.py quick_norm/abs_norm :58-66.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def legacy_norm(x: Array, unbiased: bool = False) -> Array:
    """Mean/std-normalize the nonzero entries of x; zeros stay zero.

    ``unbiased=False`` is the dataset LegacyNorm (population std, sum/n —
    data_augmentation.py:311-330). ``unbiased=True`` divides by n-1: the SNN
    runner normalizes with torch's default ``tensor.std()`` on the nonzero
    subset (rec_snn_forward.py:34), which is the unbiased estimator — the
    two reference norms differ and must not be conflated.

    Degenerate cases match the reference: all-zero input or zero stddev
    return x unchanged.
    """
    nonzero = (x != 0).astype(jnp.float32)
    num = jnp.sum(nonzero)
    safe_num = jnp.maximum(num, 1.0)
    mean = jnp.sum(x) / safe_num
    sq = jnp.sum(x * x) - safe_num * mean * mean
    denom = jnp.maximum(num - 1.0, 1.0) if unbiased else safe_num
    std = jnp.sqrt(jnp.maximum(sq / denom, 0.0))
    normed = nonzero * (x - mean) / jnp.where(std == 0, 1.0, std)
    return jnp.where((num > 0) & (std != 0), normed, x)


def _nearest_rank_percentile(x: Array, q: float) -> Array:
    """Nearest-rank percentile == torch.kthvalue with k = 1 + round(q/100*(n-1)).

    Uses sort (TPU-friendly; event tensors are small enough that a full sort
    is cheaper than iterative selection).
    """
    flat = jnp.ravel(x)
    n = flat.shape[0]
    k = int(round(0.01 * float(q) * (n - 1)))  # 0-based index
    return jnp.sort(flat)[k]


def robust_norm(x: Array, low_perc: float = 0.0, top_perc: float = 95.0) -> Array:
    """Percentile-clamp then rescale by (x - min) / (max + eps).

    Matches the reference quirk of dividing by max(normed) rather than the
    range (data_augmentation.py:63-66).
    """
    t_max = _nearest_rank_percentile(x, top_perc)
    t_min = _nearest_rank_percentile(x, low_perc)
    eps = 1e-6
    clamped = jnp.clip(x, t_min, t_max)
    normed = (clamped - jnp.min(clamped)) / (jnp.max(clamped) + eps)
    return jnp.where((t_max == 0) & (t_min == 0), x, normed)


robust_1_99 = functools.partial(robust_norm, low_perc=1.0, top_perc=99.0)


def quick_norm(x: Array) -> Array:
    return (x - jnp.min(x)) / (jnp.max(x) - jnp.min(x) + 1e-6)


def abs_norm(x: Array) -> Array:
    y = x - jnp.min(x)
    m = jnp.max(y)
    return jnp.where(m != 0, y / jnp.where(m == 0, 1.0, m), y)


def to_uint8_image(img) -> "np.ndarray":
    """[0,1] float array -> uint8 image (reference torch2cv2,
    inference_utils.py:12-17): squeeze, clip, scale."""
    import numpy as _np

    arr = _np.asarray(img).squeeze()
    return (_np.clip(arr, 0.0, 1.0) * 255).astype(_np.uint8)


def from_uint8_image(img) -> Array:
    """uint8 image -> [0,1] float (1, 1, H, W)-style device array (reference
    cv2torch, inference_utils.py:19-23), returned as (1, H, W, 1) NHWC."""
    import numpy as _np

    arr = _np.asarray(img).astype(_np.float32) / 255.0
    return jnp.asarray(arr)[None, :, :, None]
