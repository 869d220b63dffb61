"""Bilinear grid sampling (torch F.grid_sample equivalent).

Used by the temporal-consistency loss warp (model/losses/losses.py:214-216)
and event flow-warping (event_utils.py:576-618). Implements the torch
default semantics: ``align_corners=False``, zero padding — the reference
builds align_corners=True-style grids but calls grid_sample without the
flag, so sampling itself is align_corners=False (replicated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_sample_bilinear(
    img: Array, grid: Array, align_corners: bool = False
) -> Array:
    """Sample ``img`` (N, H, W, C) at ``grid`` (N, Ho, Wo, 2) of normalized
    (x, y) coords in [-1, 1]. Out-of-range samples read zeros."""
    n, h, w, c = img.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (w - 1)
        fy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1.0) * w - 1.0) * 0.5
        fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    dx = fx - x0
    dy = fy - y0

    def fetch(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yc, xc)  # (N,Ho,Wo,C)
        return vals * inb[..., None].astype(img.dtype)

    v00 = fetch(x0, y0)
    v01 = fetch(x0 + 1, y0)
    v10 = fetch(x0, y0 + 1)
    v11 = fetch(x0 + 1, y0 + 1)
    dx = dx[..., None].astype(img.dtype)
    dy = dy[..., None].astype(img.dtype)
    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )


def warp_by_flow(img: Array, flow: Array) -> Array:
    """Warp (N, H, W, C) by a (N, H, W, 2) displacement field (pixels),
    building the normalized grid the way the reference TC loss does
    (align_corners=True-style normalization, losses.py:199-211)."""
    n, h, w, _ = img.shape
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    gx = 2.0 * (xx + flow[..., 0]) / (w - 1) - 1.0
    gy = 2.0 * (yy + flow[..., 1]) / (h - 1) - 1.0
    return grid_sample_bilinear(img, jnp.stack([gx, gy], axis=-1))
