"""SPADE-E2VID: recurrent UNet whose decoder SPADE-normalizes on the
previous prediction (reference: model/spade_e2vid/spade_e2v.py:7-293).

Architecture (Unet6, reference :237-293): head conv 5->32; three
Conv-BN-ReLU-ConvLSTM encoders (strides 1/2/2); two BN resblocks; two
ICNR-pixel-shuffle up-blocks with SPADE norm conditioned on the previous
3-channel prediction; one recurrent up layer; 1x1 conv -> BN -> sigmoid to
BGR; wrapper converts BGR->gray and feeds the prediction back as the next
step's SPADE segmap (:25-37). First prediction is bootstrapped from the
first 3 voxel channels min-max normalized (:28-32).

The reference runs fp16 end-to-end on CUDA; here ``dtype=jnp.bfloat16`` is
the TPU analog (configurable). State is explicit:
``{"states": (4 LSTM states), "pred": (N,H,W,3), "initialized": bool}``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bde2vid_tpu.models.api import register_model
from bde2vid_tpu.nn.layers import pixel_shuffle, resize_nearest_torch
from bde2vid_tpu.nn.recurrent import ConvLSTMCell, lstm_initial_state

Array = jax.Array


class SPADE(nn.Module):
    """Spatially-adaptive (de)normalization (reference :144-175):
    affine-free BN on x, then gamma/beta predicted from the segmap by a
    shared conv + two heads: out = bn(x) * (1 + gamma) + beta."""

    norm_nc: int
    nhidden: int = 64
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, segmap: Array) -> Array:
        normalized = nn.BatchNorm(
            use_running_average=not self.train,
            use_scale=False,
            use_bias=False,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="param_free_norm",
        )(x)
        # nearest-resize segmap to x's spatial size with TORCH floor
        # semantics (reference F.interpolate mode='nearest'; jax's
        # half-pixel nearest samples different source pixels)
        n, h, w, _ = x.shape
        seg = resize_nearest_torch(segmap, h, w)
        conv = lambda f, name: nn.Conv(
            f, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=name
        )
        actv = jax.nn.relu(conv(self.nhidden, "mlp_shared0")(seg))
        gamma = conv(self.norm_nc, "mlp_gamma")(actv)
        beta = conv(self.norm_nc, "mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


class SpadeRecurrentConvLayer(nn.Module):
    """conv(no bias) -> BN -> relu -> ConvLSTM (reference :105-122)."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, state):
        k, s = self.kernel_size, self.stride
        p = k // 2
        y = nn.Conv(
            self.features,
            (k, k),
            strides=(s, s),
            padding=((p, p), (p, p)),
            use_bias=False,
            dtype=self.dtype,
            name="conv0",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(y)
        y = jax.nn.relu(y)
        return ConvLSTMCell(self.features, 3, dtype=self.dtype, name="recurrent_block")(
            y, state
        )


class SpadeResidualBlock(nn.Module):
    """conv-BN-relu-conv-BN + skip -> relu, no-bias convs (reference :125-141)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name=name,
        )
        conv = lambda name: nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name=name,
        )
        y = jax.nn.relu(bn("bn1")(conv("conv1")(x)))
        y = bn("bn2")(conv("conv2")(y))
        return jax.nn.relu(y + x)


class SpadeUpConvLayer(nn.Module):
    """conv(k3, no bias) -> pixel_shuffle -> SPADE(prev pred) -> relu
    (reference UpConvLayer3 :211-245, ICNR init)."""

    features: int
    scale: int = 2
    nom: int = 3
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, x_org: Array) -> Array:
        y = nn.Conv(
            self.features * self.scale**2,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=icnr_init(self.scale),
            dtype=self.dtype,
            name="conv0",
        )(x)
        y = pixel_shuffle(y, self.scale)
        y = SPADE(self.features, dtype=self.dtype, train=self.train, name="norm")(y, x_org)
        return jax.nn.relu(y)


def icnr_init(scale: int = 2, base=nn.initializers.kaiming_normal()):
    """ICNR: sub-pixel kernels initialized identically so the pixel-shuffle
    starts as nearest-neighbor upsampling (reference icnr :202-209)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        sub = base(key, (kh, kw, cin, cout // scale**2), dtype)
        return jnp.repeat(sub, scale**2, axis=-1).reshape(kh, kw, cin, cout)

    return init


class Unet6(nn.Module):
    """The SPADE generator (reference :237-293)."""

    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, states, pred: Array):
        relu = jax.nn.relu
        head = relu(
            nn.Conv(32, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype, name="fc")(x)
        )
        x0, s0 = SpadeRecurrentConvLayer(
            64, stride=1, dtype=self.dtype, train=self.train, name="rec0"
        )(head, states[0])
        x1, s1 = SpadeRecurrentConvLayer(
            128, stride=2, dtype=self.dtype, train=self.train, name="rec1"
        )(x0, states[1])
        x2, s2 = SpadeRecurrentConvLayer(
            256, stride=2, dtype=self.dtype, train=self.train, name="rec2"
        )(x1, states[2])
        y = SpadeResidualBlock(256, dtype=self.dtype, train=self.train, name="res0")(x2)
        y = SpadeResidualBlock(256, dtype=self.dtype, train=self.train, name="res1")(y)
        y = SpadeUpConvLayer(128, dtype=self.dtype, train=self.train, name="up0")(
            y + x2, pred
        )
        y = SpadeUpConvLayer(64, dtype=self.dtype, train=self.train, name="up1")(
            y + x1, pred
        )
        y, s3 = SpadeRecurrentConvLayer(
            32, kernel_size=5, stride=1, dtype=self.dtype, train=self.train, name="up2"
        )(y + x0, states[3])
        img = nn.Conv(3, (1, 1), dtype=self.dtype, name="conv_img")(relu(y + head))
        img = nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn_img",
        )(img)
        return jax.nn.sigmoid(img), (s0, s1, s2, s3)


def bgr_to_gray(bgr: Array) -> Array:
    """BGR (NHWC, C=3) -> grayscale, matching the reference's
    rgb_to_grayscale(bgr[:, [2,1,0]]) (spade_e2v.py:21-23)."""
    return (
        0.299 * bgr[..., 2:3] + 0.587 * bgr[..., 1:2] + 0.114 * bgr[..., 0:1]
    )


@register_model("SPADEE2VID")
class SPADEE2VID(nn.Module):
    """Wrapper: feeds the previous prediction into SPADE; bootstraps the
    first prediction from the first 3 voxel channels (reference :25-37).

    Step signature matches the common protocol; each call consumes ONE
    (sub-)voxel. The reference consumes a stack of event-rate sub-voxels per
    item — the eval driver handles that by scanning sub-voxels and reading
    the prediction at item boundaries.
    """

    config: Dict[str, Any] = None
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        pred = state["pred"].astype(voxel.dtype)
        initialized = state["initialized"]
        first3 = voxel[..., :3]
        # reference gate is on the RAW max (spade_e2v.py:27-30): an
        # all-non-positive first window keeps the raw tensor as the initial
        # segmap; only then shift by min and divide by the POST-shift max
        raw_mx = jnp.max(first3)
        shifted = first3 - jnp.min(first3)
        mx = jnp.max(shifted)
        boot = jnp.where(raw_mx != 0, shifted / jnp.where(mx == 0, 1.0, mx), first3)
        pred = jnp.where(initialized, pred, boot)

        out, new_states = Unet6(dtype=self.dtype, train=self.train, name="generator")(
            voxel, state["states"], pred
        )
        new_state = {
            "states": new_states,
            "pred": out.astype(jnp.float32),
            "initialized": jnp.ones((), jnp.bool_),
        }
        return {"image": bgr_to_gray(out), "image_bgr": out}, new_state

    def initial_state(self, batch, height, width, dtype=None):
        dtype = dtype or jnp.float32
        h2, w2 = (height + 1) // 2, (width + 1) // 2
        h4, w4 = (h2 + 1) // 2, (w2 + 1) // 2
        return {
            "states": (
                lstm_initial_state(batch, height, width, 64, dtype),
                lstm_initial_state(batch, h2, w2, 128, dtype),
                lstm_initial_state(batch, h4, w4, 256, dtype),
                lstm_initial_state(batch, height, width, 32, dtype),
            ),
            "pred": jnp.zeros((batch, height, width, 3), jnp.float32),
            "initialized": jnp.zeros((), jnp.bool_),
        }
