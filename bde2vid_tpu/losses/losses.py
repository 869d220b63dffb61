"""Training losses, functional style (reference model/losses/losses.py).

- L1Loss (:131-138)
- PerceptualLoss (:141-162): LPIPS net-lin distance (order: pred, target)
- VIPLoss (:15-128): sum over backbone slices of (1 - cos_sim) between the
  RAW (not unit-normalized-by-LPIPS-lin) features, plus — when previous-step
  features exist — a temporal feature-difference cosine term
  cos(x - u, y - z) where (u, z) are the previous step's (pred, gt)
  features. The reference caches previous features on the module
  (self.outsz/outsu with reset()); here they are explicit loss state.
- TemporalConsistencyLoss (:165-231): Lai ECCV'18 warping error with an
  exponential visibility mask, via bilinear grid sampling.

All losses are differentiable pure functions of (params, images, state).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bde2vid_tpu.metrics.lpips import (
    LPIPS,
    AlexNetFeatures,
    VGG16Features,
    _SHIFT,
    _SCALE,
)
from bde2vid_tpu.nn.sampling import warp_by_flow

Array = jax.Array

LOSS_REGISTRY: Dict[str, Callable] = {}


def register_loss(name):
    def deco(cls):
        LOSS_REGISTRY[name] = cls
        return cls

    return deco


def build_loss(cfg: Dict[str, Any]):
    cfg = dict(cfg)
    name = cfg.pop("type")
    return LOSS_REGISTRY[name](**cfg)


def _to_pm1_3ch(x: Array, normalize: bool) -> Array:
    if normalize:
        x = 2.0 * x - 1.0
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    return x


def _scaled(x: Array) -> Array:
    return (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)


@register_loss("L1Loss")
class L1Loss:
    def __init__(self, weight: float = 1.0):
        self.weight = weight

    def init_state(self):
        return ()

    def __call__(self, params, pred, target, state=()):
        return jnp.mean(jnp.abs(pred - target)) * self.weight, ()


@register_loss("PerceptualLoss")
class PerceptualLoss:
    """LPIPS distance as a loss; needs LPIPS params (converted backbone +
    lin heads). forward_pair order is (pred, target) here — unlike the
    metric wrapper which passes (target, pred) (losses.py:160 vs
    evaluate/metrics.py:95); LPIPS is symmetric in practice but we keep both
    call orders faithful."""

    def __init__(self, net: str = "alex", weight: float = 1.0):
        self.module = LPIPS(net=net)
        self.weight = weight

    def init_state(self):
        return ()

    def __call__(self, params, pred, target, state=()):
        p = _to_pm1_3ch(pred, True)
        t = _to_pm1_3ch(target, True)
        dist = self.module.apply(params, p, t)
        return jnp.mean(dist) * self.weight, ()


def _cos_sim(a: Array, b: Array, eps: float = 1e-10) -> Array:
    """Per-pixel channel cosine similarity, averaged spatially -> (N,)
    (LPIPS/util/util.py:77-88)."""
    na = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + eps)
    nb = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + eps)
    return jnp.mean(jnp.sum(na * nb, axis=-1), axis=(1, 2))


@register_loss("VIPLoss")
class VIPLoss:
    """Video-consistency perceptual loss with cached previous-step features.

    State: None or (prev_pred_feats, prev_gt_feats) tuples of per-slice
    feature arrays. ``reset()`` == pass ``init_state()``.
    """

    def __init__(self, net: str = "alex", normalize: bool = True, w: float = 1.0):
        self.net = net
        self.normalize = normalize
        self.w = w
        self._backbone = (
            AlexNetFeatures(name="backbone")
            if net == "alex"
            else VGG16Features(name="backbone")
        )

    def init_state(self):
        return None

    def _feats(self, params, x):
        # expects LPIPS-style params: {'params': {'backbone': ...}}
        sub = {"params": params["params"]["backbone"]}
        return self._backbone.apply(sub, _scaled(x))

    def __call__(self, params, pred, target, state=None):
        x = _to_pm1_3ch(pred, self.normalize)
        y = _to_pm1_3ch(target, self.normalize)
        outsx = self._feats(params, x)
        outsy = self._feats(params, y)
        dist = 0.0
        for kk in range(len(outsx)):
            cur = 1.0 - _cos_sim(outsx[kk], outsy[kk])
            if state is not None:
                outsu, outsz = state  # previous (pred feats, gt feats)
                cur = cur + (
                    1.0 - _cos_sim(outsx[kk] - outsu[kk], outsy[kk] - outsz[kk])
                )
            dist = dist + cur
        new_state = (outsx, outsy)
        return jnp.mean(dist) * self.w, new_state

    def step(self, params, pred, target, state, seen):
        """Scan-friendly variant: ``state`` always has the full feature
        structure and the temporal term is gated by the traced boolean
        ``seen`` (False reproduces the ``state=None`` semantics of
        ``__call__``). Features are extracted once."""
        x = _to_pm1_3ch(pred, self.normalize)
        y = _to_pm1_3ch(target, self.normalize)
        outsx = self._feats(params, x)
        outsy = self._feats(params, y)
        outsu, outsz = state
        dist = 0.0
        temporal = 0.0
        for kk in range(len(outsx)):
            dist = dist + (1.0 - _cos_sim(outsx[kk], outsy[kk]))
            temporal = temporal + (
                1.0 - _cos_sim(outsx[kk] - outsu[kk], outsy[kk] - outsz[kk])
            )
        total = dist + jnp.where(seen, temporal, jnp.zeros_like(temporal))
        return jnp.mean(total) * self.w, (outsx, outsy)


def temporal_consistency_loss(
    image0: Array,
    image1: Array,
    processed0: Array,
    processed1: Array,
    flow01: Array,
    alpha: float = 50.0,
) -> Array:
    """Lai ECCV'18 warping error (reference :192-231). All images NHWC;
    flow01 (N, H, W, 2) displacement from image1 to image0."""
    image0_w = warp_by_flow(image0, flow01)
    visibility = jnp.exp(-alpha * (image1 - image0_w) ** 2)
    processed0_w = warp_by_flow(processed0, flow01)
    tc_map = (
        visibility
        * jnp.abs(processed1 - processed0_w)
        / (jnp.abs(processed1) + jnp.abs(processed0_w) + 1e-5)
    )
    return jnp.mean(tc_map)


@register_loss("TemporalConsistencyLoss")
class TemporalConsistencyLoss:
    """Applies from step L0 onward (reference V5:232-236 gates on
    idx_t > func.L0)."""

    def __init__(self, L0: int = 2, weight: float = 1.0):
        self.L0 = L0
        self.weight = weight

    def init_state(self):
        return ()

    def __call__(self, params, image0, image1, processed0, processed1, flow01, state=()):
        return (
            temporal_consistency_loss(image0, image1, processed0, processed1, flow01)
            * self.weight,
            (),
        )
