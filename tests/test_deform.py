"""Deformable conv tests vs a NumPy oracle implementing the mmcv semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bde2vid_tpu.nn.deform import (
    AlignAdd,
    AlignAdd2,
    DeformConv2dPack,
    GatedAdd,
    SepDconv,
    deform_conv2d,
)


def deform_conv2d_np(x, offsets, weight, stride=1, padding=0, dilation=1, dg=1):
    """Naive oracle. x (N,H,W,C), offsets (N,Ho,Wo,dg*2*K) [y,x] order,
    weight (kh,kw,C,O)."""
    n, h, w, c = x.shape
    kh, kw, _, oc = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    cg = c // dg
    out = np.zeros((n, ho, wo, oc), np.float64)

    def sample(img, py, px):  # img (H, W) -> bilinear with zero pad
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        dy, dx = py - y0, px - x0
        val = 0.0
        for (yy, xx, wgt) in [
            (y0, x0, (1 - dy) * (1 - dx)),
            (y0, x0 + 1, (1 - dy) * dx),
            (y0 + 1, x0, dy * (1 - dx)),
            (y0 + 1, x0 + 1, dy * dx),
        ]:
            if 0 <= yy < h and 0 <= xx < w:
                val += wgt * img[yy, xx]
        return val

    for b in range(n):
        for i in range(ho):
            for j in range(wo):
                off = offsets[b, i, j].reshape(dg, k, 2)
                for g in range(dg):
                    for ki in range(kh):
                        for kj in range(kw):
                            tap = ki * kw + kj
                            py = i * stride - padding + ki * dilation + off[g, tap, 0]
                            px = j * stride - padding + kj * dilation + off[g, tap, 1]
                            for cc in range(cg):
                                ch = g * cg + cc
                                v = sample(x[b, :, :, ch], py, px)
                                out[b, i, j] += v * weight[ki, kj, ch]
    return out.astype(np.float32)


@pytest.mark.parametrize("stride,padding,dg", [(1, 1, 1), (2, 1, 2)])
def test_deform_conv_matches_oracle(rng, stride, padding, dg):
    n, h, w, c, oc, k = 1, 8, 9, 4, 3, 3
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    ho = (h + 2 * padding - (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - (k - 1) - 1) // stride + 1
    offsets = rng.normal(0, 1.0, size=(n, ho, wo, dg * 2 * k * k)).astype(np.float32)
    weight = rng.normal(size=(k, k, c, oc)).astype(np.float32)
    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
            stride=stride, padding=padding, deform_groups=dg,
        )
    )
    want = deform_conv2d_np(x, offsets, weight, stride, padding, 1, dg)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_deform_conv_zero_offsets_is_conv(rng):
    """With zero offsets deformable conv == regular conv."""
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    weight = rng.normal(size=(3, 3, 4, 5)).astype(np.float32)
    offsets = jnp.zeros((1, 8, 8, 18))
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), offsets, jnp.asarray(weight), padding=1)
    )
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fusion_blocks_smoke(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    for mod, shape in [
        (AlignAdd(4), (1, 8, 8, 4)),
        (AlignAdd2(4), (1, 8, 8, 4)),
        (GatedAdd(4), (1, 8, 8, 4)),
    ]:
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out.shape == shape and np.isfinite(np.asarray(out)).all()

    sep = SepDconv(8)
    params = sep.init(jax.random.PRNGKey(0), x, x)
    out, offs = sep.apply(params, x, x)
    assert out.shape == (1, 8, 8, 8)
    # cascading offsets
    out2, _ = sep.apply(params, x, x, init_offset=offs)
    assert np.isfinite(np.asarray(out2)).all()


def test_pack_zero_init_starts_as_regular_conv(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    pack = DeformConv2dPack(5, 3, padding=1)
    params = pack.init(jax.random.PRNGKey(0), x)
    got = np.asarray(pack.apply(params, x))
    w = params["params"]["weight"]
    want = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
