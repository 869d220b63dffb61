"""NumPy oracle implementations of the rasterizers, for testing only.

Written directly from the behavioral spec (SURVEY.md §3.2); these follow the
reference loop structure (per-bin passes) precisely *because* they exist to
cross-check the fused TPU formulation in voxel.py against an independent
implementation — the same role the reference's own two independent voxelizers
(event_utils.py:694-730 and model/EVSNN/utils/util.py:34-80) play for each
other.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def events_to_image_np(
    xs, ys, ps, sensor_size: Tuple[int, int] = (180, 240)
) -> np.ndarray:
    h, w = sensor_size
    img = np.zeros((h, w), np.float64)
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    np.add.at(img, (ys[keep].astype(np.int64), xs[keep].astype(np.int64)), ps[keep])
    return img.astype(np.float32)


def events_to_image_bilinear_np(
    xs, ys, ps, sensor_size: Tuple[int, int] = (180, 240), padding: bool = True
) -> np.ndarray:
    h, w = sensor_size
    if padding:
        h, w = h + 1, w + 1
    xs = np.asarray(xs, np.float64)
    ys = np.asarray(ys, np.float64)
    ps = np.asarray(ps, np.float64)
    mask = ((xs < w - 1) & (ys < h - 1) & (xs >= 0) & (ys >= 0)).astype(np.float64)
    px = np.floor(xs)
    py = np.floor(ys)
    dx = xs - px
    dy = ys - py
    pxi = (px * mask).astype(np.int64)
    pyi = (py * mask).astype(np.int64)
    wgt = ps * mask
    img = np.zeros((h, w), np.float64)
    np.add.at(img, (pyi, pxi), wgt * (1 - dx) * (1 - dy))
    np.add.at(img, (pyi, pxi + 1), wgt * dx * (1 - dy))
    np.add.at(img, (pyi + 1, pxi), wgt * (1 - dx) * dy)
    np.add.at(img, (pyi + 1, pxi + 1), wgt * dx * dy)
    return img.astype(np.float32)


def events_to_voxel_np(
    xs, ys, ts, ps, num_bins: int = 5, sensor_size: Tuple[int, int] = (180, 240)
) -> np.ndarray:
    """Per-bin loop, matching the reference algorithm shape exactly."""
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    ts = np.asarray(ts, np.float64)
    ps = np.asarray(ps, np.float64)
    if len(ts) == 0:
        return np.zeros((num_bins, *sensor_size), np.float32)
    dt = ts[-1] - ts[0]
    t_norm = (ts - ts[0]) / dt * (num_bins - 1) if dt > 0 else np.zeros_like(ts)
    out = []
    for bi in range(num_bins):
        bw = np.maximum(0.0, 1.0 - np.abs(t_norm - bi))
        out.append(events_to_image_np(xs, ys, ps * bw, sensor_size))
    return np.stack(out).astype(np.float32)


def events_to_neg_pos_voxel_np(
    xs, ys, ts, ps, num_bins: int = 5, sensor_size: Tuple[int, int] = (180, 240)
):
    pos = np.where(np.asarray(ps) > 0, 1.0, 0.0)
    neg = np.where(np.asarray(ps) <= 0, 1.0, 0.0)
    return (
        events_to_voxel_np(xs, ys, ts, pos, num_bins, sensor_size),
        events_to_voxel_np(xs, ys, ts, neg, num_bins, sensor_size),
    )
