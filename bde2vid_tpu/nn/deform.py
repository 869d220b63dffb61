"""Deformable convolution (gather-based, MXU-friendly) + fusion blocks.

Reference: mmcv ``deform_conv2d`` (CUDA) used by the alignment blocks
AlignAdd / AlignAdd2 / SepDconv (model/submodules.py:267-300, 491-650;
duplicated in e2vid/submodules.py). These blocks are constructed for
checkpoint-config model variants and must exist with the same call surface
(SURVEY §2.1 note: no eval model instantiates them, but the API is part of
the framework contract).

TPU formulation: deformable conv = offset-shifted bilinear **gather** into
an im2col patch tensor (N, Ho, Wo, K*C), then ONE matmul with the (K*C, O)
reshaped kernel — the FLOPs land on the MXU, the irregular access is a
vectorized gather (XLA handles it; no atomic scatter needed since sampling
is a pure read).

Offset layout matches mmcv: (N, Ho, Wo, dg*2*K) channels ordered
``[y0, x0, y1, x1, ...]`` per deform group.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def deform_conv2d(
    x: Array,  # (N, H, W, C)
    offsets: Array,  # (N, Ho, Wo, dg*2*K)
    weight: Array,  # (kh, kw, C, O)
    bias: Optional[Array] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    deform_groups: int = 1,
) -> Array:
    n, h, w, c = x.shape
    kh, kw, _, out_ch = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid per output position and tap
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding  # (Ho,)
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding  # (Wo,)
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    by = oy[:, None] + ky[None, :]  # (Ho, kh)
    bx = ox[:, None] + kx[None, :]  # (Wo, kw)
    base_y = jnp.broadcast_to(by[:, None, :, None], (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(bx[None, :, None, :], (ho, wo, kh, kw)).reshape(ho, wo, k)

    off = offsets.reshape(n, ho, wo, deform_groups, k, 2)
    py = base_y[None, :, :, None, :] + off[..., 0]  # (N, Ho, Wo, dg, K)
    px = base_x[None, :, :, None, :] + off[..., 1]

    # bilinear gather with zero padding outside
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    dy = (py - y0)[..., None]
    dx = (px - x0)[..., None]

    cg = c // deform_groups
    xg = x.reshape(n, h, w, deform_groups, cg)

    def fetch(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)

        def per_n(img, yy, xx):
            # img (H, W, dg, cg); yy/xx (Ho, Wo, dg, K)
            def per_g(img_g, y_g, x_g):
                return img_g[y_g, x_g]  # (Ho, Wo, K, cg)

            return jax.vmap(per_g, in_axes=(2, 2, 2), out_axes=2)(img, yy, xx)

        vals = jax.vmap(per_n)(xg, yc, xc)  # (N, Ho, Wo, dg, K, cg)
        return vals * inb[..., None].astype(x.dtype)

    v00 = fetch(y0, x0)
    v01 = fetch(y0, x0 + 1)
    v10 = fetch(y0 + 1, x0)
    v11 = fetch(y0 + 1, x0 + 1)
    patches = (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    )  # (N, Ho, Wo, dg, K, cg)

    # one big matmul on the MXU: (N*Ho*Wo, K*C) @ (K*C, O)
    patches = patches.transpose(0, 1, 2, 4, 3, 5).reshape(n * ho * wo, k * c)
    wmat = weight.reshape(k * c, out_ch)
    out = patches @ wmat.astype(patches.dtype)
    out = out.reshape(n, ho, wo, out_ch)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class DeformConv2dPack(nn.Module):
    """mmcv DeformConv2dPack: the offset field is predicted from the input
    by a zero-initialized conv (so the layer starts as a regular conv)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    deform_groups: int = 1
    use_bias: bool = False  # mmcv DeformConv2d has no bias by default
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, offset_input: Optional[Array] = None) -> Array:
        k, s, p, d = self.kernel_size, self.stride, self.padding, self.dilation
        src = x if offset_input is None else offset_input
        offsets = nn.Conv(
            self.deform_groups * 2 * k * k,
            (k, k),
            strides=(s, s),
            padding=((p, p), (p, p)),
            kernel_dilation=(d, d),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset",
        )(src)
        weight = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return deform_conv2d(
            x, offsets, weight, bias, stride=s, padding=p, dilation=d,
            deform_groups=self.deform_groups,
        )


class AlignAdd(nn.Module):
    """Split channels in half; deform-align the first half (offsets
    predicted from it) and add the second (model/submodules.py:267-283)."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x1, x2 = jnp.split(x, 2, axis=-1)
        k = self.kernel_size
        aligned = DeformConv2dPack(
            self.features, k, padding=k // 2, dtype=self.dtype, name="dconv"
        )(x1)
        return aligned + x2


class AlignAdd2(nn.Module):
    """Offsets predicted from the FULL input; deform conv applied to the
    first half; add the second half (model/submodules.py:491-545)."""

    features: int
    kernel_size: int = 3
    deform_groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ifeat, efeat = jnp.split(x, 2, axis=-1)
        k = self.kernel_size
        aligned = DeformConv2dPack(
            self.features,
            k,
            padding=k // 2,
            deform_groups=self.deform_groups,
            dtype=self.dtype,
            name="pack",
        )(ifeat, offset_input=x)
        return aligned + efeat


class SepDconv(nn.Module):
    """Deform conv with a SEPARATE offset-source tensor; returns the offsets
    too so they can be cascaded (model/submodules.py:573-650)."""

    features: int
    kernel_size: int = 3
    deform_groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, offset_x: Array, x: Array, init_offset: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        k = self.kernel_size
        offsets = nn.Conv(
            self.deform_groups * 2 * k * k,
            (k, k),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset",
        )(offset_x)
        if init_offset is not None:
            offsets = offsets + init_offset
        weight = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        out = deform_conv2d(
            x, offsets, weight, None, padding=k // 2, deform_groups=self.deform_groups
        )
        return out, offsets


class GatedAdd(nn.Module):
    """Sigmoid gate -> halve channels by add -> conv
    (model/submodules.py:552-570)."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        gate = jax.nn.sigmoid(
            nn.Conv(
                x.shape[-1],
                (k, k),
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                dtype=self.dtype,
                name="gate0",
            )(x)
        )
        x = x * gate
        x1, x2 = jnp.split(x, 2, axis=-1)
        y = x1 + x2
        from bde2vid_tpu.nn.layers import ConvLayer

        return ConvLayer(
            self.features, k, padding=k // 2, dtype=self.dtype, name="conv"
        )(y)
