"""Per-module numerical parity vs PyTorch implementations with shared weights.

The torch modules here are written from the standard layer definitions (same
math the reference uses); copying weights across and comparing outputs pins
down layout/alignment subtleties: torch-style conv padding at stride 2,
transposed-conv flip semantics, bilinear align_corners=False, pixel_shuffle
channel ordering, LSTM/GRU gate order.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bde2vid_tpu.nn.layers import (
    ConvLayer,
    TransposedConvLayer,
    UpsampleConvLayer,
    pixel_shuffle,
    resize_bilinear_2x,
)
from bde2vid_tpu.nn.recurrent import ConvGRUCell, ConvLSTMCell

ATOL = 2e-5


def t2j_conv(w):
    """torch conv weight (O,I,kh,kw) -> flax (kh,kw,I,O)."""
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def nhwc(x_nchw_t):
    return x_nchw_t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("h,w,stride", [(16, 24, 1), (16, 24, 2), (15, 23, 2)])
def test_convlayer_matches_torch(rng, h, w, stride):
    cin, cout, k = 4, 6, 5
    x = rng.normal(size=(2, h, w, cin)).astype(np.float32)
    tconv = torch.nn.Conv2d(cin, cout, k, stride=stride, padding=2)
    layer = ConvLayer(cout, k, stride=stride, padding=2, activation="relu")
    params = {
        "params": {
            "conv": {
                "kernel": t2j_conv(tconv.weight),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    want = nhwc(torch.relu(tconv(nchw(x))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_transposed_conv_matches_torch(rng):
    cin, cout, k, p = 4, 6, 5, 2
    x = rng.normal(size=(2, 16, 24, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(cin, cout, k, stride=2, padding=p, output_padding=1)
    # torch ConvTranspose weight (I,O,kh,kw) -> pre-flipped correlation kernel
    wt = tconv.weight.detach().numpy()  # (I,O,kh,kw)
    kernel = jnp.asarray(wt[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    layer = TransposedConvLayer(cout, k, padding=p, activation=None)
    params = {
        "params": {
            "kernel": kernel,
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    want = nhwc(tconv(nchw(x)))
    assert got.shape == want.shape == (2, 32, 48, cout)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_bilinear_resize_matches_torch(rng):
    x = rng.normal(size=(2, 9, 13, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_2x(jnp.asarray(x)))
    want = nhwc(
        F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.normal(size=(2, 5, 7, 16)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    want = nhwc(F.pixel_shuffle(nchw(x), 2))
    np.testing.assert_allclose(got, want, atol=0)


def test_upsample_conv_matches_torch(rng):
    cin, cout = 4, 6
    x = rng.normal(size=(1, 10, 14, cin)).astype(np.float32)
    tconv = torch.nn.Conv2d(cin, cout, 5, padding=2)
    layer = UpsampleConvLayer(cout, 5, padding=2, activation="relu")
    params = {
        "params": {
            "conv": {
                "kernel": t2j_conv(tconv.weight),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(layer.apply(params, jnp.asarray(x)))
    up = F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
    want = nhwc(torch.relu(tconv(up)))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_convlstm_matches_torch(rng):
    """Gate order i,f,o,g over conv(concat(x,h)) — the checkpoint-sensitive bit."""
    cin = hidden = 8
    k = 3
    x = rng.normal(size=(2, 12, 16, cin)).astype(np.float32)
    h0 = rng.normal(size=(2, 12, 16, hidden)).astype(np.float32)
    c0 = rng.normal(size=(2, 12, 16, hidden)).astype(np.float32)
    gates = torch.nn.Conv2d(cin + hidden, 4 * hidden, k, padding=1)

    cell = ConvLSTMCell(hidden, k)
    params = {
        "params": {
            "gates": {
                "kernel": t2j_conv(gates.weight),
                "bias": jnp.asarray(gates.bias.detach().numpy()),
            }
        }
    }
    y, (h1, c1) = cell.apply(params, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)))

    g = gates(torch.cat([nchw(x), nchw(h0)], dim=1))
    i, f, o, gg = g.chunk(4, 1)
    c_t = torch.sigmoid(f) * nchw(c0) + torch.sigmoid(i) * torch.tanh(gg)
    h_t = torch.sigmoid(o) * torch.tanh(c_t)
    np.testing.assert_allclose(np.asarray(h1), nhwc(h_t), atol=ATOL)
    np.testing.assert_allclose(np.asarray(c1), nhwc(c_t), atol=ATOL)
    np.testing.assert_allclose(np.asarray(y), nhwc(h_t), atol=ATOL)


def test_convgru_matches_torch(rng):
    cin = hidden = 8
    k = 3
    x = rng.normal(size=(2, 12, 16, cin)).astype(np.float32)
    h0 = rng.normal(size=(2, 12, 16, hidden)).astype(np.float32)
    reset = torch.nn.Conv2d(cin + hidden, hidden, k, padding=1)
    update = torch.nn.Conv2d(cin + hidden, hidden, k, padding=1)
    out = torch.nn.Conv2d(cin + hidden, hidden, k, padding=1)

    cell = ConvGRUCell(hidden, k)
    params = {
        "params": {
            "reset_gate": {
                "kernel": t2j_conv(reset.weight),
                "bias": jnp.asarray(reset.bias.detach().numpy()),
            },
            "update_gate": {
                "kernel": t2j_conv(update.weight),
                "bias": jnp.asarray(update.bias.detach().numpy()),
            },
            "out_gate": {
                "kernel": t2j_conv(out.weight),
                "bias": jnp.asarray(out.bias.detach().numpy()),
            },
        }
    }
    y, h1 = cell.apply(params, jnp.asarray(x), jnp.asarray(h0))

    xin = torch.cat([nchw(x), nchw(h0)], dim=1)
    z = torch.sigmoid(update(xin))
    r = torch.sigmoid(reset(xin))
    cand = torch.tanh(out(torch.cat([nchw(x), nchw(h0) * r], dim=1)))
    want = nchw(h0) * (1 - z) + cand * z
    np.testing.assert_allclose(np.asarray(h1), nhwc(want), atol=ATOL)
    np.testing.assert_allclose(np.asarray(y), nhwc(want), atol=ATOL)
