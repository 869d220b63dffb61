"""Spatial pad/crop to network-friendly sizes.

Reference: utils_func/inference_utils.py (optimal_crop_size :26-32,
CropParameters :35-69, Croper :72-114). The reference has a lazy ``Croper``
that re-derives padding when the input shape changes; in JAX shapes are
static per-sequence, so one ``CropParameters`` per sequence covers both and
the pad/crop are pure functions usable under jit.

Layout note: these operate on NHWC (TPU layout); the reference pads NCHW.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def optimal_crop_size(max_size: int, max_subsample_factor: int, safety_margin: int = 0) -> int:
    """Smallest multiple of 2^max_subsample_factor that is >= max_size,
    plus ``safety_margin`` extra multiples.

    The reference's twins disagree: the eval-path copy accepts but IGNORES
    safety_margin (utils_func/inference_utils.py:26-32) while the eitr and
    EVSNN copies add it (model/eitr/model_util.py:130-136,
    model/EVSNN/utils/util.py:82-88). Every reference call site passes 0,
    where all three agree; this unified version honors the margin."""
    f = 2**max_subsample_factor
    return int(f * math.ceil(max_size / f)) + safety_margin * f


class CropParameters:
    """Compute zero-padding to /2^num_encoders and the inverse center crop.

    Padding splits the slack with ceil on top/left (matching the reference
    ZeroPad2d construction); crop recovers the exact original region.
    """

    def __init__(self, width: int, height: int, num_encoders: int, safety_margin: int = 0):
        self.width = width
        self.height = height
        self.num_encoders = num_encoders
        self.width_crop_size = optimal_crop_size(width, num_encoders, safety_margin)
        self.height_crop_size = optimal_crop_size(height, num_encoders, safety_margin)

        self.padding_top = math.ceil(0.5 * (self.height_crop_size - height))
        self.padding_bottom = math.floor(0.5 * (self.height_crop_size - height))
        self.padding_left = math.ceil(0.5 * (self.width_crop_size - width))
        self.padding_right = math.floor(0.5 * (self.width_crop_size - width))

        cx = math.floor(self.width_crop_size / 2)
        cy = math.floor(self.height_crop_size / 2)
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)

    def pad(self, x: Array) -> Array:
        """Zero-pad (..., H, W, C) to the crop size."""
        pads = [(0, 0)] * (x.ndim - 3) + [
            (self.padding_top, self.padding_bottom),
            (self.padding_left, self.padding_right),
            (0, 0),
        ]
        return jnp.pad(x, pads)

    def crop(self, x: Array) -> Array:
        """Center-crop (..., H', W', C) back to the original size."""
        if self.num_encoders == -1:
            return x
        return x[..., self.iy0 : self.iy1, self.ix0 : self.ix1, :]


def optimal_crop_size_multiple(max_size: int, factor: int, safety_margin: int = 0) -> int:
    """Smallest multiple of ``factor`` >= max_size (+margin) — the eitr
    variant that takes a divisor instead of an exponent
    (model/eitr/model_util.py OptimalCropSize)."""
    return int(factor * math.ceil((max_size + safety_margin) / factor))


class CropSize3D:
    """(T, H, W) zero-pad to patch-size multiples + inverse center crop
    (reference model/eitr/model_util.py:20-58). Operates on
    (..., T, H, W, C) arrays (the reference pads NCTHW)."""

    def __init__(self, width: int, height: int, time: int, patch_size: dict,
                 safety_margin: int = 0):
        self.width, self.height, self.time = width, height, time
        self.width_crop_size = optimal_crop_size_multiple(width, patch_size["w"], safety_margin)
        self.height_crop_size = optimal_crop_size_multiple(height, patch_size["h"], safety_margin)
        self.time_crop_size = optimal_crop_size_multiple(time, patch_size["t"], safety_margin)

        self.padding_top = math.ceil(0.5 * (self.height_crop_size - height))
        self.padding_bottom = math.floor(0.5 * (self.height_crop_size - height))
        self.padding_left = math.ceil(0.5 * (self.width_crop_size - width))
        self.padding_right = math.floor(0.5 * (self.width_crop_size - width))
        self.padding_front = math.ceil(0.5 * (self.time_crop_size - time))
        self.padding_back = math.floor(0.5 * (self.time_crop_size - time))

        ct = math.floor(self.time_crop_size / 2)
        cy = math.floor(self.height_crop_size / 2)
        cx = math.floor(self.width_crop_size / 2)
        self.it0 = ct - math.floor(time / 2)
        self.it1 = ct + math.ceil(time / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)

    def pad(self, x: Array) -> Array:
        pads = [(0, 0)] * (x.ndim - 4) + [
            (self.padding_front, self.padding_back),
            (self.padding_top, self.padding_bottom),
            (self.padding_left, self.padding_right),
            (0, 0),
        ]
        return jnp.pad(x, pads)

    def crop(self, x: Array) -> Array:
        return x[..., self.it0:self.it1, self.iy0:self.iy1, self.ix0:self.ix1, :]
