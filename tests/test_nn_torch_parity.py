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


def test_resize_nearest_matches_torch(rng):
    """resize_nearest_torch must floor-sample like F.interpolate('nearest')
    — jax.image.resize's half-pixel nearest picks different pixels (r3
    review: SPADE segmap conditioning sampled the wrong rows)."""
    from bde2vid_tpu.nn.layers import resize_nearest_torch

    for (h, w), (oh, ow) in [((32, 40), (16, 20)), ((17, 23), (9, 12)),
                             ((8, 8), (16, 16)), ((30, 20), (11, 7))]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        got = np.asarray(resize_nearest_torch(jnp.asarray(x), oh, ow))
        want = (
            F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          size=(oh, ow), mode="nearest")
            .numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_array_equal(got, want), (h, w, oh, ow)


def test_resize_bilinear_half_matches_torch(rng):
    """Non-antialiased 0.5x bilinear must match F.interpolate(scale=0.5,
    bilinear, align_corners=False) — jax's default antialias widens the
    kernel and diverged by ~0.6 (r3 review)."""
    from bde2vid_tpu.nn.layers import resize_bilinear_half

    x = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_half(jnp.asarray(x)))
    want = (
        F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      scale_factor=0.5, mode="bilinear", align_corners=False)
        .numpy().transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_residual_block_instance_norm_matches_torch(rng):
    """ResidualBlock norm='IN' must be the reference's STAT-LESS
    nn.InstanceNorm2d (per-instance stats at eval; model/submodules.py:337)
    — running-stats zeros/ones made it a near-no-op (r3 review)."""
    from bde2vid_tpu.nn.layers import ResidualBlock

    c = 8

    class TRes(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(c, c, 3, padding=1)
            self.bn1 = torch.nn.InstanceNorm2d(c)
            self.conv2 = torch.nn.Conv2d(c, c, 3, padding=1)
            self.bn2 = torch.nn.InstanceNorm2d(c)

        def forward(self, x):
            r = x
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + r)

    torch.manual_seed(0)
    tnet = TRes().eval()
    x = rng.normal(size=(2, 12, 14, c)).astype(np.float32)
    blk = ResidualBlock(c, norm="IN")
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # stat-less: the IN layers must create NO batch_stats variables
    assert "batch_stats" not in params
    t2n = lambda t: t.detach().numpy()
    p = dict(params["params"])
    p["conv1"] = {"kernel": t2n(tnet.conv1.weight).transpose(2, 3, 1, 0),
                  "bias": t2n(tnet.conv1.bias)}
    p["conv2"] = {"kernel": t2n(tnet.conv2.weight).transpose(2, 3, 1, 0),
                  "bias": t2n(tnet.conv2.bias)}
    got = np.asarray(blk.apply({"params": p}, jnp.asarray(x)))
    with torch.no_grad():
        want = t2n(tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unet_flow_uses_configured_kernel(rng):
    """The reference UNetFlow builds head/encoders from kernel_size
    (unet.py:293-300) while UNetRecurrent hardcodes 5 — a k=3 FlowNet
    checkpoint must produce k=3 param shapes here."""
    from bde2vid_tpu.models import build_model

    m = build_model("FlowNet", {"num_bins": 5, "num_encoders": 2,
                                "base_num_channels": 8,
                                "num_residual_blocks": 1, "kernel_size": 3})
    v = jnp.zeros((1, 32, 32, 5))
    params = m.init(jax.random.PRNGKey(0), v, m.initial_state(1, 32, 32))
    flat = {"/".join(map(str, [getattr(k, "key", k) for k in path])): leaf.shape
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    head_shapes = [s for k, s in flat.items() if "head" in k and "kernel" in k]
    assert any(s[:2] == (3, 3) for s in head_shapes), head_shapes
    # and E2VIDRecurrent stays hardcoded at 5 regardless of kernel_size
    m5 = build_model("E2VIDRecurrent", {"num_bins": 5, "num_encoders": 2,
                                        "base_num_channels": 8,
                                        "num_residual_blocks": 1,
                                        "kernel_size": 3})
    p5 = m5.init(jax.random.PRNGKey(0), v, m5.initial_state(1, 32, 32))
    flat5 = {"/".join(map(str, [getattr(k, "key", k) for k in path])): leaf.shape
             for path, leaf in jax.tree_util.tree_flatten_with_path(p5)[0]}
    head5 = [s for k, s in flat5.items() if "head" in k and "kernel" in k]
    assert any(s[:2] == (5, 5) for s in head5), head5
