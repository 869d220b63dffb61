"""Convolutional building blocks.

Capability parity with model/e2vid/submodules.py (ConvLayer :16-45,
TransposedConvLayer :47-76, UpsampleConvLayer :78-108, ResidualBlock :210-249)
and model/submodules.py (PixelShufflePack :39-81), rebuilt for TPU:

- NHWC layout so XLA maps convs straight onto the MXU without layout passes.
- Explicit (low, high) padding pairs reproducing torch alignment exactly.
- Activations resolved by name, mirroring the reference's
  ``getattr(torch, activation)`` lookup (so 'relu'/'sigmoid'/'tanh'/...).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    "elu": jax.nn.elu,
    # exact erf GELU — torch nn.GELU() default; jax.nn.gelu defaults to the
    # tanh approximation which breaks checkpoint parity
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "softplus": jax.nn.softplus,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def get_activation(name: Optional[str]) -> Callable[[Array], Array]:
    """Name -> fn, mirroring the reference's getattr(torch, name) registry.

    'default' maps to relu (model/BDE2VID/submodules.py:96-100); None/identity
    pass through.
    """
    if name is None:
        return _ACTIVATIONS["identity"]
    if name == "default":
        return _ACTIVATIONS["relu"]
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}") from None


def skip_sum(x1: Array, x2: Array) -> Array:
    return x1 + x2


def skip_concat(x1: Array, x2: Array) -> Array:
    return jnp.concatenate([x1, x2], axis=-1)


def torch_pad(kernel_size: int, padding: Optional[int] = None):
    """Explicit symmetric padding pairs matching torch's ``padding=p``."""
    p = kernel_size // 2 if padding is None else padding
    return ((p, p), (p, p))


class InstanceNorm(nn.Module):
    """InstanceNorm2d, NO affine transform (torch's ``affine=False``
    default — this module creates no scale/bias params).

    Two reference flavors, selected by ``track_stats``:
    - ConvLayer/Upsample/Transposed sites use
      ``nn.InstanceNorm2d(track_running_stats=True)``
      (e2vid/submodules.py:33): at eval torch normalizes with the
      *running* mean/var — ``track_stats=True`` + ``use_running_average``.
    - ResidualBlock uses plain ``nn.InstanceNorm2d(out_channels)``
      (model/submodules.py:337-338, e2vid/submodules.py:224): stat-less,
      per-instance statistics at train AND eval, no checkpoint tensors —
      ``track_stats=False`` (creates no batch_stats variables; normalizing
      with never-populated zeros/ones here was an r3 review finding).
    """

    features: int
    epsilon: float = 1e-5
    use_running_average: bool = True
    track_stats: bool = True
    dtype: jnp.dtype = jnp.float32

    momentum: float = 0.1  # torch InstanceNorm2d default

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.track_stats and self.use_running_average:
            mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros((self.features,))
            )
            var = self.variable(
                "batch_stats", "var", lambda: jnp.ones((self.features,))
            )
            m, v = mean.value, var.value
        else:
            m = jnp.mean(x, axis=(1, 2), keepdims=True)
            v = jnp.var(x, axis=(1, 2), keepdims=True)
            if self.track_stats:
                # torch IN(track_running_stats=True) in TRAIN mode updates
                # the running stats with momentum 0.1: batch-mean of the
                # per-instance means, and the UNBIASED per-instance vars
                # (n/(n-1), n = H*W) — previously the variables were
                # created but never written, so eval normalized with
                # zeros/ones after any training run (r3 review)
                mean = self.variable(
                    "batch_stats", "mean", lambda: jnp.zeros((self.features,))
                )
                var = self.variable(
                    "batch_stats", "var", lambda: jnp.ones((self.features,))
                )
                if not self.is_initializing():
                    n = x.shape[1] * x.shape[2]
                    unbias = n / max(n - 1, 1)
                    new_m = jnp.mean(m, axis=(0, 1, 2))
                    new_v = jnp.mean(v, axis=(0, 1, 2)) * unbias
                    mom = self.momentum
                    mean.value = (1 - mom) * mean.value + mom * new_m
                    var.value = (1 - mom) * var.value + mom * new_v
        y = (x - m) * jax.lax.rsqrt(v + self.epsilon)
        # torch InstanceNorm2d default affine=False
        return y.astype(self.dtype)


def _make_norm(
    norm: Optional[str],
    features: int,
    dtype,
    train: bool,
    name: str = "norm_layer",
    in_track_stats: bool = True,
):
    """``in_track_stats=False`` selects the reference ResidualBlock's
    stat-less InstanceNorm (see InstanceNorm docstring); BN is unaffected."""
    if norm == "BN":
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    if norm == "IN":
        return InstanceNorm(
            features=features,
            use_running_average=not train,
            track_stats=in_track_stats,
            dtype=dtype,
            name=name,
        )
    return None


class ConvLayer(nn.Module):
    """conv -> optional BN/IN -> activation (reference ConvLayer).

    bias is dropped under BN, matching ``bias = False if norm == 'BN'``
    (e2vid/submodules.py:21).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None  # default: torch padding=0 ONLY if explicit
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    groups: int = 1
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = 0 if self.padding is None else self.padding
        y = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.norm != "BN",
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = _make_norm(self.norm, self.features, self.dtype, self.train)
        if norm is not None:
            y = norm(y)
        return get_activation(self.activation)(y)


class TransposedConvLayer(nn.Module):
    """Stride-2 transposed conv (reference TransposedConvLayer, :47-76).

    Implemented as an input-dilated conv for exact torch semantics:
    torch ConvTranspose2d(stride=2, padding=p, output_padding=1) ==
    conv(lhs_dilation=2, pad=(k-1-p, k-1-p+1)) with the kernel stored
    pre-flipped. Output is exactly 2x the spatial size for p=k//2 (odd k).
    """

    features: int
    kernel_size: int = 5
    padding: int = 2
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, p = self.kernel_size, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
            jnp.float32,
        )
        lo, hi = k - 1 - p, k - 1 - p + 1  # output_padding=1
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.norm != "BN":
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        norm = _make_norm(self.norm, self.features, self.dtype, self.train)
        if norm is not None:
            y = norm(y)
        return get_activation(self.activation)(y)


def resize_bilinear_2x(x: Array) -> Array:
    """x2 bilinear upsample, align_corners=False (== half-pixel centers).

    jax.image.resize('linear') uses half-pixel sampling, identical to
    ``F.interpolate(mode='bilinear', align_corners=False)``.
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="linear")


def resize_bilinear_half(x: Array) -> Array:
    """0.5x bilinear downsample matching torch F.interpolate(scale=0.5,
    bilinear, align_corners=False): antialias OFF — torch samples 2 taps;
    jax's default antialias widens the kernel to 4 taps and diverges by
    ~0.6 on unit-normal inputs (r3 review, verified empirically)."""
    n, h, w, c = x.shape
    return jax.image.resize(
        x, (n, h // 2, w // 2, c), method="linear", antialias=False
    )


def resize_nearest_torch(x: Array, out_h: int, out_w: int) -> Array:
    """Nearest-neighbor resize with TORCH semantics: src = floor(dst * in/out)
    (F.interpolate mode='nearest'). jax.image.resize('nearest') rounds at
    half-pixel centers and samples DIFFERENT pixels (e.g. rows {1,3,5...}
    instead of {0,2,4...} on a 2x downscale) — a checkpoint-parity trap for
    SPADE's segmap conditioning (r3 review, verified empirically)."""
    n, h, w, c = x.shape
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    # one fused gather (an x[:, rows][:, :, cols] chain materializes an
    # (N, out_h, W, C) intermediate)
    return x[:, rows[:, None], cols[None, :]]


class UpsampleConvLayer(nn.Module):
    """bilinear x2 -> conv -> norm -> act (reference UpsampleConvLayer, :78-108).

    The artifact-free upsampling path ("slow, but no checkerboard").
    """

    features: int
    kernel_size: int = 5
    padding: Optional[int] = None
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = resize_bilinear_2x(x)
        pad = 0 if self.padding is None else self.padding
        y = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.norm != "BN",
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = _make_norm(self.norm, self.features, self.dtype, self.train)
        if norm is not None:
            y = norm(y)
        return get_activation(self.activation)(y)


def pixel_shuffle(x: Array, r: int) -> Array:
    """(N,H,W,C*r^2) -> (N,H*r,W*r,C), matching torch F.pixel_shuffle.

    torch pixel_shuffle on NCHW views channels as (C, r, r); in NHWC the
    equivalent is reshape to (..., C, r, r) then interleave.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c
    return x.reshape(n, h * r, w * r, c)


class PixelShufflePack(nn.Module):
    """conv -> pixel_shuffle upsample (reference model/submodules.py:39-81).

    upsample_kernel conv produces C*r^2 channels which pixel_shuffle
    rearranges into an r-times-larger feature map.
    """

    features: int
    scale_factor: int = 2
    upsample_kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.upsample_kernel
        p = (k - 1) // 2
        y = nn.Conv(
            self.features * self.scale_factor**2,
            (k, k),
            padding=((p, p), (p, p)),
            # reference init_weights -> default_init_weights kaiming
            # (model/submodules.py:20-36,76-81)
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
            name="upsample_conv",
        )(x)
        return pixel_shuffle(y, self.scale_factor)


class ResidualBlock(nn.Module):
    """conv-norm-relu-conv-norm + skip, final relu (reference :210-249)."""

    features: int
    stride: int = 1
    norm: Optional[str] = None
    groups: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        residual = x
        use_bias = self.norm != "BN"
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv1",
        )(x)
        # in_track_stats=False: the reference ResidualBlock's IN is the
        # stat-less nn.InstanceNorm2d(out_channels) (model/submodules.py:337)
        n1 = _make_norm(self.norm, self.features, self.dtype, self.train,
                        name="bn1", in_track_stats=False)
        if n1 is not None:
            y = n1(y)
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv2",
        )(y)
        n2 = _make_norm(self.norm, self.features, self.dtype, self.train,
                        name="bn2", in_track_stats=False)
        if n2 is not None:
            y = n2(y)
        if self.downsample:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                dtype=self.dtype,
                name="downsample",
            )(x)
        return jax.nn.relu(y + residual)


class ResidualBlockNoBN(nn.Module):
    """Norm-free resblock with NO final activation and residual scale 1
    (reference bde2vid_cross_scale_propogation_V5.py:262-274: conv-relu-conv + x).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1"
        )(x)
        y = jax.nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2"
        )(y)
        return x + y
