"""EITR tests: transformer-block parity vs torch MHA + full checkpoint parity."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bde2vid_tpu.models import build_model
from bde2vid_tpu.nn.transformer import (
    MultiheadAttention,
    TransformerEncoder,
    sine_position_table,
)

D, HEADS = 32, 4


def test_mha_matches_torch(rng):
    tm = nn.MultiheadAttention(D, HEADS, dropout=0.0)
    tm.eval()
    x = rng.normal(size=(1, 10, D)).astype(np.float32)

    m = MultiheadAttention(D, HEADS)
    params = {
        "params": {
            "in_proj_kernel": jnp.asarray(tm.in_proj_weight.detach().numpy().T),
            "in_proj_bias": jnp.asarray(tm.in_proj_bias.detach().numpy()),
            "out_proj": {
                "kernel": jnp.asarray(tm.out_proj.weight.detach().numpy().T),
                "bias": jnp.asarray(tm.out_proj.bias.detach().numpy()),
            },
        }
    }
    xa = jnp.asarray(x)
    got = np.asarray(m.apply(params, xa, xa, xa))
    with torch.no_grad():
        ts = torch.from_numpy(x.transpose(1, 0, 2))  # (S, N, C) torch layout
        want = tm(ts, ts, ts)[0].numpy().transpose(1, 0, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sine_position_table_matches_reference_formula():
    t = sine_position_table(16, 8)
    pos, j = 3, 2
    angle = pos / 10000 ** (2 * (j // 2) / 8)
    assert t[pos, j] == pytest.approx(np.sin(angle), abs=1e-6)
    assert t[pos, j + 1] == pytest.approx(np.cos(pos / 10000 ** (2 * ((j + 1) // 2) / 8)), abs=1e-6)


# --------------- full EITR checkpoint parity (torch replica) ----------------


class TEncLayer(nn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.norm1 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ff)
        self.linear2 = nn.Linear(ff, d)
        self.norm2 = nn.LayerNorm(d)

    def forward(self, src):
        q = self.norm1(src)
        src = src + self.self_attn(q, q, q)[0]
        y = self.norm2(src)
        return src + self.linear2(F.relu(self.linear1(y)))


class TDecLayer(nn.Module):
    def __init__(self, d, h, ff):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.norm1 = nn.LayerNorm(d)
        self.cross_attn = nn.MultiheadAttention(d, h, dropout=0.0)
        self.norm21 = nn.LayerNorm(d)
        self.norm22 = nn.LayerNorm(d)
        self.linear1 = nn.Linear(d, ff)
        self.linear2 = nn.Linear(ff, d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, memory):
        q = self.norm1(tgt)
        tgt = tgt + self.self_attn(q, q, q)[0]
        q = self.norm21(tgt)
        kv = self.norm22(memory)
        tgt = tgt + self.cross_attn(q, kv, kv)[0]
        y = self.norm3(tgt)
        return tgt + self.linear2(F.relu(self.linear1(y)))


def _wrap_stack(layers, kind):
    inner = nn.Module()
    inner.layers = nn.ModuleList(layers)
    outer = nn.Module()
    setattr(outer, kind, inner)
    return outer


class TEITR(nn.Module):
    """Key-compatible torch mls_tpa with d=32 (scaled down for test speed)."""

    def __init__(self, d=32, nbins=5, base=8):
        super().__init__()
        conv = lambda ci, co, k, s, p: nn.Conv2d(ci, co, k, s, p)
        head = nn.Module()
        head.conv2d = conv(nbins, base, 5, 1, 2)
        self.head = head
        chans = [base, base * 2, base * 4, d]
        downs = []
        for i in range(3):
            inner = nn.Module()
            inner.conv2d = conv(chans[i], chans[i + 1], 5, 2, 2)
            wrap = nn.Module()
            wrap.conv = inner
            rec = nn.Module()
            rec.Gates = nn.Conv2d(2 * chans[i + 1], 4 * chans[i + 1], 3, padding=1)
            wrap.recurrent_block = rec
            downs.append(wrap)
        self.DownsampleConv = nn.ModuleList(downs)
        self.split1 = conv(chans[2], d, 2, 2, 0)
        self.split2 = conv(chans[1], d, 4, 4, 0)
        ff = 64
        for i in range(3):
            setattr(self, f"trans_encoder{i}",
                    _wrap_stack([TEncLayer(d, HEADS, ff) for _ in range(3)], "encoder"))
            setattr(self, f"trans_decoder{i}",
                    _wrap_stack([TDecLayer(d, HEADS, ff) for _ in range(2)], "decoder"))
        ups = []
        for ci, co in [(d, chans[2]), (chans[2], chans[1]), (chans[1], chans[0])]:
            u = nn.Module()
            u.conv2d = conv(ci, co, 5, 1, 2)
            ups.append(u)
        self.UpsampleConv = nn.ModuleList(ups)
        pred = nn.Module()
        pred.conv2d = conv(base, 1, 1, 1, 0)
        self.pred = pred

    def lstm(self, wrap, x, state):
        x = torch.relu(wrap.conv.conv2d(x))
        h, c = state
        i, f, o, g = wrap.recurrent_block.Gates(torch.cat([x, h], 1)).chunk(4, 1)
        c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        return h, (h, c)

    def run_stack(self, outer, kind, x, memory=None):
        for layer in getattr(outer, kind).layers:
            x = layer(x) if memory is None else layer(x, memory)
        return x

    def forward(self, x, states, pos_table):
        x = torch.relu(self.head.conv2d(x))
        head = x
        blocks, new_states = [], []
        for i, wrap in enumerate(self.DownsampleConv):
            x, st = self.lstm(wrap, x, states[i])
            blocks.append(x)
            new_states.append(st)
        n, c, h8, w8 = blocks[2].shape
        toks = lambda t: t.flatten(2).transpose(1, 2)
        w0 = toks(blocks[2])
        w1 = toks(self.split1(blocks[1]))
        w2 = toks(self.split2(blocks[0]))
        pos = pos_table[: w0.shape[1]][None]
        sf = lambda t: t.transpose(0, 1)  # (N,S,C) -> (S,N,C)
        hs0 = self.run_stack(self.trans_encoder0, "encoder", sf(w0 + pos))
        hs1 = self.run_stack(self.trans_encoder1, "encoder", sf(w1 + pos))
        hs2 = self.run_stack(self.trans_encoder2, "encoder", sf(w2 + pos))
        hc0 = self.run_stack(self.trans_decoder0, "decoder", hs0, hs0)
        hc1 = self.run_stack(self.trans_decoder1, "decoder", hs1, hs0)
        hc2 = self.run_stack(self.trans_decoder2, "decoder", hs2, hs1)
        hs = (hs0 + hs1 + hs2 + hc0 + hc1 + hc2) / 6
        hs = hs.permute(1, 2, 0).reshape(n, -1, h8, w8)
        up2 = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=False)
        for i, u in enumerate(self.UpsampleConv):
            hs = torch.relu(u.conv2d(up2(hs + blocks[2 - i])))
        return torch.sigmoid(self.pred.conv2d(hs + head)), new_states


def test_eitr_checkpoint_parity(rng, tmp_path):
    torch.manual_seed(0)
    tnet = TEITR().eval()
    ckpt = {
        "arch": "EITR",
        "config": {"arch": {"args": {"eitr_kwargs": {
            "num_bins": 5, "norm": None, "d_model": 32,
            "dim_feedforward": 64, "nhead": 4,
            "channels": [8, 16, 32, 32]}}}},
        "state_dict": tnet.state_dict(),
    }
    path = str(tmp_path / "eitr.pth")
    torch.save(ckpt, path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.name == "EITR"

    H, W = 32, 40  # already /8 so padding is identity on both sides
    voxel = rng.normal(size=(1, H, W, 5)).astype(np.float32)
    state = spec.module.initial_state(1, H, W)
    out, state = spec.module.apply(spec.params, jnp.asarray(voxel), state)
    got = np.asarray(out["image"])[0, :, :, 0]

    z = lambda ch, h, w: (torch.zeros(1, ch, h, w), torch.zeros(1, ch, h, w))
    tstates = [z(16, H // 2, W // 2), z(32, H // 4, W // 4), z(32, H // 8, W // 8)]
    pos_table = torch.from_numpy(sine_position_table(8000, 32))
    with torch.no_grad():
        want, _ = tnet(
            torch.from_numpy(voxel.transpose(0, 3, 1, 2)), tstates, pos_table
        )
    np.testing.assert_allclose(got, want[0, 0].numpy(), atol=5e-5)


def test_eitr_internal_padding(rng):
    """Non-/8 input exercises the internal CropSize pad/crop roundtrip."""
    m = build_model("EITR", {"num_bins": 5, "norm": None, "d_model": 32,
                             "dim_feedforward": 64, "nhead": 4,
                             "channels": [8, 16, 32, 32]})
    st = m.initial_state(1, 36, 44)
    v = jnp.asarray(rng.normal(size=(1, 36, 44, 5)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), v, st)
    out, _ = m.apply(params, v, st)
    assert out["image"].shape == (1, 36, 44, 1)


def test_generic_transformer_shapes(rng):
    """The reference's unused generic enc-dec (eitr/transformer.py:8-34):
    output keeps token shape; pos and task_embed route correctly."""
    from bde2vid_tpu.nn.transformer import Transformer

    m = Transformer(d_model=32, nhead=4, num_encoder_layers=2,
                    num_decoder_layers=2, dim_feedforward=64)
    src = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
    task = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), src, pos, task)
    out = m.apply(params, src, pos, task)
    assert out.shape == src.shape
    assert np.isfinite(np.asarray(out)).all()
    # pos/task actually influence the output
    out2 = m.apply(params, src, None, None)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
