"""Data augmentation / transforms.

Reference: utils_func/data_augmentation.py :30-334 (Compose, CenterCrop,
RandomCrop, RandomRotationFlip, RobustNorm, LegacyNorm, voxel noise, hot
pixels, sequence image normalization). Host-side geometric transforms are
NumPy (they run in the loader); noise injections are JAX (they run on
device against device voxels). Norms live in utils.norm.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ----------------------------- geometric (host) -----------------------------


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x, is_flow: bool = False):
        for t in self.transforms:
            x = t(x, is_flow=is_flow)
        return x


class CenterCrop:
    """Center crop (..., H, W) arrays (reference :90-124). The offsets use
    python round() — banker's rounding, so a half-pixel slack of 7.5 goes
    to 8, unlike floor."""

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, x, is_flow: bool = False):
        h, w = x.shape[-2:]
        th, tw = self.size
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return x[..., i : i + th, j : j + tw]


class RandomCrop:
    """Random crop; call ``sample_params(h, w, rng)`` once per sequence so
    every item crops identically (the reference reseeds python random with a
    shared seed per sequence)."""

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self._ij: Optional[Tuple[int, int]] = None

    def sample_params(self, h: int, w: int, rng: np.random.Generator):
        th, tw = self.size
        self._ij = (int(rng.integers(0, h - th + 1)), int(rng.integers(0, w - tw + 1)))

    def __call__(self, x, is_flow: bool = False):
        if self._ij is None:
            raise RuntimeError("call sample_params first")
        i, j = self._ij
        th, tw = self.size
        return x[..., i : i + th, j : j + tw]


def _np_grid_sample_bilinear(img: np.ndarray, grid: np.ndarray) -> np.ndarray:
    """NumPy twin of nn/sampling.grid_sample_bilinear (align_corners=False,
    zeros padding): img (H, W, C), grid (H, W, 2) normalized (x, y)."""
    h, w, _ = img.shape
    fx = ((grid[..., 0].astype(np.float64) + 1.0) * w - 1.0) * 0.5
    fy = ((grid[..., 1].astype(np.float64) + 1.0) * h - 1.0) * 0.5
    x0 = np.floor(fx)
    y0 = np.floor(fy)
    dx = (fx - x0)[..., None].astype(np.float32)
    dy = (fy - y0)[..., None].astype(np.float32)

    def fetch(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = np.clip(xi, 0, w - 1).astype(np.int64)
        yc = np.clip(yi, 0, h - 1).astype(np.int64)
        return img[yc, xc] * inb[..., None].astype(np.float32)

    v00 = fetch(x0, y0)
    v01 = fetch(x0 + 1, y0)
    v10 = fetch(x0, y0 + 1)
    v11 = fetch(x0 + 1, y0 + 1)
    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )


class RandomRotationFlip:
    """Continuous-angle affine rotation + axis flips via grid sampling
    (reference :158-246): sample an angle uniformly from ``degrees``, flip
    the rotation matrix's columns for h/v flips, resample through an
    affine grid (zeros padding, align_corners=False — the installed
    torch's F.affine_grid/grid_sample defaults the reference hits). Flow
    fields additionally get their channels mixed by the INVERSE matrix.

    Call ``sample_params(rng)`` once per sequence (or ``set_params`` for
    deterministic use); operates on (C, H, W) arrays like the reference."""

    def __init__(self, degrees=0.0, p_hflip: float = 0.5, p_vflip: float = 0.5):
        if isinstance(degrees, (int, float)):
            if degrees < 0:
                raise ValueError("degrees must be non-negative")
            degrees = (-degrees, degrees)
        self.degrees = tuple(degrees)
        self.p_hflip = p_hflip
        self.p_vflip = p_vflip
        self._fwd: Optional[np.ndarray] = None
        self._inv: Optional[np.ndarray] = None

    def sample_params(self, rng):
        # same draw order as the reference get_params (:201-212)
        angle = rng.uniform(self.degrees[0], self.degrees[1])
        hflip = rng.random() < self.p_hflip
        vflip = rng.random() < self.p_vflip
        self.set_params(angle, hflip, vflip)

    def set_params(self, angle_deg: float, hflip: bool, vflip: bool):
        a = np.deg2rad(angle_deg)
        m = np.array(
            [[np.cos(a), -np.sin(a), 0.0],
             [np.sin(a), np.cos(a), 0.0],
             [0.0, 0.0, 1.0]], np.float64,
        )
        if hflip:
            m[:, 0] *= -1
        if vflip:
            m[:, 1] *= -1
        self._fwd = m[:2, :].astype(np.float32)
        self._inv = np.linalg.inv(m)[:2, :2].astype(np.float32)

    def __call__(self, x, is_flow: bool = False):
        if self._fwd is None:
            raise RuntimeError("call sample_params/set_params first")
        x = np.asarray(x, np.float32)
        c, h, w = x.shape
        # F.affine_grid(align_corners=False) base coords: pixel centers
        gx = (2.0 * np.arange(w) + 1.0) / w - 1.0
        gy = (2.0 * np.arange(h) + 1.0) / h - 1.0
        X, Y = np.meshgrid(gx, gy)
        pts = np.stack([X, Y, np.ones_like(X)], axis=-1)  # (H, W, 3)
        grid = (pts @ self._fwd.T).astype(np.float32)  # output -> input coords
        # pure-NumPy bilinear sampling (same math as nn/sampling
        # grid_sample_bilinear, align_corners=False, zeros padding): this
        # is a HOST loader transform — dispatching through JAX would ship
        # every augmented item to the default device (the tunneled TPU in
        # production, ~1-2 ms/dispatch) and back
        out = _np_grid_sample_bilinear(x.transpose(1, 2, 0), grid)
        out = np.ascontiguousarray(out.transpose(2, 0, 1))  # (C, H, W)
        if is_flow:
            a = self._inv
            vx, vy = out[0].copy(), out[1].copy()
            out[0] = a[0, 0] * vx + a[0, 1] * vy
            out[1] = a[1, 0] * vx + a[1, 1] * vy
        return out


# ------------------------------ noise (device) -------------------------------


def add_noise_to_voxel(
    voxel: Array, rng: jax.Array, noise_std: float = 1.0, noise_fraction: float = 0.1
) -> Array:
    """Gaussian noise on a random fraction of voxel entries
    (reference data_augmentation.py:40-45)."""
    k1, k2 = jax.random.split(rng)
    noise = noise_std * jax.random.normal(k1, voxel.shape, voxel.dtype)
    if noise_fraction < 1.0:
        mask = jax.random.uniform(k2, voxel.shape) >= noise_fraction
        noise = jnp.where(mask, 0.0, noise)
    return voxel + noise


def add_hot_pixels_to_sequence(
    voxels: Array,
    rng: jax.Array,
    hot_pixel_std: float = 1.0,
    max_hot_pixel_fraction: float = 0.001,
) -> Array:
    """Persistent hot pixels added to every step of a (T, ..., H, W, C) voxel
    sequence (reference :48-59). Same pixels/values across T."""
    k0, k1, k2, k3 = jax.random.split(rng, 4)
    h, w = voxels.shape[-3], voxels.shape[-2]
    fraction = jax.random.uniform(k0) * max_hot_pixel_fraction
    max_n = max(int(max_hot_pixel_fraction * h * w), 1)
    xs = jax.random.randint(k1, (max_n,), 0, w)
    ys = jax.random.randint(k2, (max_n,), 0, h)
    vals = jax.random.normal(k3, (max_n,)) * hot_pixel_std
    n_active = (fraction * h * w).astype(jnp.int32)
    active = (jnp.arange(max_n) < n_active).astype(voxels.dtype)
    img = jnp.zeros((h, w), voxels.dtype).at[ys, xs].add(vals * active)
    return voxels + img[..., None]


def normalize_image_sequence(frames: Array, eps: float = 1e-5) -> Array:
    """1-99 percentile rescale of a whole frame sequence, clamped to [0,1]
    (reference :30-37). Percentiles use np.percentile's default LINEAR
    interpolation between ranks, not nearest-rank."""

    def _perc(flat, q):
        n = flat.shape[0]
        pos = q / 100.0 * (n - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        frac = pos - lo
        return flat[lo] * (1.0 - frac) + flat[hi] * frac

    flat = jnp.sort(frames.reshape(-1))
    mini = _perc(flat, 1.0)
    maxi = _perc(flat, 99.0)
    return jnp.clip((frames - mini) / (maxi - mini + eps), 0.0, 1.0)


# --------------------------- training sequences ------------------------------


def sample_pause_mask(
    length: int,
    rng: np.random.Generator,
    proba_pause_when_running: float = 0.0,
    proba_pause_when_paused: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Markov pause chain (reference SequenceDataset h5_dataset.py:721-747):
    step 0 never pauses; pausing repeats the previous item with zeroed
    events. Returns an int index map idx[t] = source item offset and a bool
    pause mask."""
    idx = np.zeros(length, np.int64)
    paused = np.zeros(length, bool)
    k = 0
    is_paused = False
    for t in range(1, length):
        p = proba_pause_when_paused if is_paused else proba_pause_when_running
        is_paused = rng.random() < p
        if not is_paused:
            k += 1
        idx[t] = k
        paused[t] = is_paused
    return idx, paused


def subsample_events(xs, ys, ts, ps, rng: np.random.Generator, min_event_num: int):
    """Random event-count subsampling (reference SynchronizedNPYDataset,
    dataset.py:309-314): when a window holds more than ``min_event_num``
    events, keep a random sorted subset of uniform size in
    [min_event_num, len]."""
    n = len(xs)
    if n <= min_event_num:
        return xs, ys, ts, ps
    keep = int(rng.integers(min_event_num, n + 1))
    idx = np.sort(rng.choice(n, keep, replace=False))
    return xs[idx], ys[idx], ts[idx], ps[idx]
