"""BDE2VID flagship tests: full checkpoint-conversion parity vs a torch
replica of the V5 generator (bidirectional LSTM sweeps, cross-frame window
attention with relative bias + dilated windows, aliased-skip decode)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bde2vid_tpu.models import build_model

BASE, ENC, KS, NRES = 8, 3, 5, 1
BUF = [-2, -1, 0, 1, 2]
DEPTHS = [2, 0, 2]
HEADS = 4
WIN = (7, 7)
T, H, W = 5, 56, 56


# ------------------------------ torch replica --------------------------------


class TWinAttn(nn.Module):
    def __init__(self, dim, window_size, num_heads, q_ind):
        super().__init__()
        self.dim, self.window_size, self.num_heads = dim, window_size, num_heads
        self.q_ind = q_ind
        self.scale = (dim // num_heads) ** -0.5
        self.q_ind_WinS = q_ind * window_size[1] * window_size[2]
        self.q_ind_WinE = self.q_ind_WinS + window_size[1] * window_size[2]
        self.norm_q = nn.LayerNorm(dim)
        self.norm_kv = nn.LayerNorm(dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn(
                (2 * window_size[0] - 1)
                * (2 * window_size[1] - 1)
                * (2 * window_size[2] - 1),
                num_heads,
            )
            * 0.02
        )
        coords = torch.stack(
            torch.meshgrid(
                torch.arange(window_size[0]),
                torch.arange(window_size[1]),
                torch.arange(window_size[2]),
                indexing="ij",
            )
        ).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window_size[0] - 1
        rel[:, :, 1] += window_size[1] - 1
        rel[:, :, 2] += window_size[2] - 1
        rel[:, :, 0] *= (2 * window_size[1] - 1) * (2 * window_size[2] - 1)
        rel[:, :, 1] *= 2 * window_size[2] - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):  # (D, B_, C, Wh, Ww)
        D, B_, C, Hh, Ww = x.shape
        kv = x.permute(0, 1, 3, 4, 2).contiguous().view(D, B_, Hh * Ww, C)
        q = x[self.q_ind].permute(0, 2, 3, 1).contiguous().view(B_, -1, C)
        kv = kv.permute(1, 0, 2, 3).contiguous().view(B_, -1, C)
        q = self.norm_q(q)
        kv = self.norm_kv(kv)
        M = q.shape[1]
        _, N, _ = kv.shape
        q = self.q(q).reshape(B_, M, self.num_heads, C // self.num_heads).permute(0, 2, 1, 3)
        kv = self.kv(kv).reshape(B_, N, 2, self.num_heads, C // self.num_heads).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index[self.q_ind_WinS : self.q_ind_WinE, :N].reshape(-1)
        ].reshape(M, N, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, M, C)
        x = self.proj(x)
        return x.view(B_, Hh, Ww, C).permute(0, 3, 1, 2).contiguous()


def t_window_partition(x, window_size, dilate):
    D, B, C, Hh, Ww = x.shape
    if not dilate:
        x = x.view(D, B, C, Hh // window_size[0], window_size[0], Ww // window_size[1], window_size[1])
        return x.permute(0, 1, 3, 5, 2, 4, 6).contiguous().view(D, -1, C, *window_size)
    x = x.view(D * B, C, Hh, Ww)
    h, w = window_size
    x = F.pad(x, (0, w, 0, h))
    x = F.unfold(x, kernel_size=window_size, dilation=(2, 2), stride=window_size)
    return x.permute(0, 2, 1).contiguous().view(D, -1, C, *window_size)


def t_window_reverse(windows, B, Hh, Ww, dilate):
    B_, C, wh, ww = windows.shape
    if not dilate:
        x = windows.view(B, Hh // wh, Ww // ww, C, wh, ww).permute(0, 3, 1, 4, 2, 5).contiguous()
        return x.view(B, C, Hh, Ww)
    x = windows.view(B, Hh // wh * (Ww // ww), -1).permute(0, 2, 1).contiguous()
    x = F.fold(x, (Hh + wh, Ww + ww), kernel_size=(wh, ww), stride=(wh, ww), dilation=(2, 2))
    return x[:, :, :-wh, :-ww]


class TSwinBlock(nn.Module):
    def __init__(self, dim, heads, window_size, dilate, q_ind):
        super().__init__()
        self.window_size = window_size
        self.dilate = dilate
        self.q_ind = q_ind
        self.attn = TWinAttn(dim, window_size, heads, q_ind)
        self.norm2 = nn.LayerNorm(dim)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, dim * 4)
        mlp.fc2 = nn.Linear(dim * 4, dim)
        self.mlp = mlp

    def forward(self, x):  # (D, B, C, H, W)
        shortcut = x[self.q_ind]
        D, B, C, Hh, Ww = x.shape
        win = tuple(min(a, b) for a, b in zip((Hh, Ww), self.window_size[-2:]))
        pad_h = (win[0] - Hh % win[0]) % win[0]
        pad_w = (win[1] - Ww % win[1]) % win[1]
        pt, pb, pl, pr = pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2
        xp = F.pad(x, (pl, pr, pt, pb))
        _, _, _, Hp, Wp = xp.shape
        wins = t_window_partition(xp, win, self.dilate)
        attn = self.attn(wins)
        y = t_window_reverse(attn, B, Hp, Wp, self.dilate)
        if pad_h or pad_w:
            y = y[:, :, pt : Hp - pb, pl : Wp - pr]
        y = shortcut + y
        z = self.norm2(y.permute(0, 2, 3, 1))
        z = self.mlp.fc2(F.gelu(self.mlp.fc1(z)))
        return y + z.permute(0, 3, 1, 2)


class TDFrameAttn(nn.Module):
    def __init__(self, dim, depth, heads, window_size, q_ind):
        super().__init__()
        self.q_ind = q_ind
        self.blocks = nn.ModuleList(
            [TSwinBlock(dim, heads, window_size, dilate=(i % 2 == 1), q_ind=q_ind) for i in range(depth)]
        )

    def forward(self, keys):
        x = keys[self.q_ind]
        for blk in self.blocks:
            keys[self.q_ind] = x
            x = blk(torch.stack(keys, dim=0))
        return x


class TConvLayer(nn.Module):
    def __init__(self, ci, co, k, s, act="relu"):
        super().__init__()
        self.conv2d = nn.Conv2d(ci, co, k, s, k // 2)
        self.act = act

    def forward(self, x):
        y = self.conv2d(x)
        if self.act == "relu":
            return torch.relu(y)
        if self.act == "relu6":
            return F.relu6(y)
        return y


class TRecConv(nn.Module):
    def __init__(self, ci, co, k):
        super().__init__()
        self.conv = TConvLayer(ci, co, k, 2)
        rec = nn.Module()
        rec.Gates = nn.Conv2d(2 * co, 4 * co, 3, padding=1)
        self.recurrent_block = rec
        self.state = None

    def forward(self, x):
        x = self.conv(x)
        if self.state is None:
            z = torch.zeros(x.shape[0], x.shape[1], x.shape[2], x.shape[3])
            self.state = (z, z.clone())
        h, c = self.state
        i, f, o, g = self.recurrent_block.Gates(torch.cat([x, h], 1)).chunk(4, 1)
        c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        self.state = (h, c)
        return h


class TV5(nn.Module):
    def __init__(self):
        super().__init__()
        self.head = TConvLayer(5, BASE, KS, 1)
        ins = [BASE * 2**i for i in range(ENC)]
        outs = [BASE * 2 ** (i + 1) for i in range(ENC)]
        self.forward_encoder = nn.ModuleList([TRecConv(i, o, KS) for i, o in zip(ins, outs)])
        self.backward_encoder = nn.ModuleList([TRecConv(i, o, KS) for i, o in zip(ins, outs)])
        self.fusion_layers = nn.ModuleList([nn.Conv2d(o * 2, o, 1) for o in outs])  # unused
        self.feat_attns = nn.ModuleList(
            [
                TDFrameAttn(outs[l], DEPTHS[l], HEADS, (len(BUF), *WIN), len(BUF) // 2)
                if DEPTHS[l] > 0
                else None
                for l in range(ENC)
            ]
        )
        dec_ins = outs[::-1]
        dec_outs = ins[::-1]
        decs = []
        for ci, co in zip(dec_ins, dec_outs):
            up = nn.Module()
            up.conv2d = nn.Conv2d(ci, co, KS, 1, KS // 2)
            decs.append(nn.Sequential(nn.Identity(), UpWrap(up)))
        self.decoders = nn.ModuleList(decs)
        self.predI = nn.Sequential(nn.Identity(), nn.Conv2d(BASE, 1, 1))

    def reset(self):
        for m in self.modules():
            if isinstance(m, TRecConv):
                m.state = None

    def forward(self, voxels):
        self.reset()
        Tn = len(voxels)
        head_seqs = [self.head(v) for v in voxels]
        target = head_seqs
        all_lvl = []
        for l in range(ENC):
            fwd = [None] * Tn
            bwd = [None] * Tn
            for idx_f in range(Tn):
                idx_b = Tn - 1 - idx_f
                fwd[idx_f] = self.forward_encoder[l](target[idx_f])
                bwd[idx_b] = self.backward_encoder[l](target[idx_b])
            merged = [f + b for f, b in zip(fwd, bwd)]
            if l == ENC - 1:
                all_lvl.append(merged)  # ALIASED list, mutated below
            if self.feat_attns[l] is not None:
                empty = torch.zeros_like(merged[0])
                for t in range(Tn):
                    buf = []
                    for off in BUF:
                        idx = off + t
                        buf.append(merged[idx] if 0 <= idx < Tn else empty)
                    x = self.feat_attns[l](buf)
                    merged[t] = x + merged[t]
            target = merged
            all_lvl.append(merged)
        outs = []
        for t in range(Tn):
            x = all_lvl[-1][t]
            for i, dec in enumerate(self.decoders):
                x = dec(all_lvl[-2 - i][t] + x)
            x = x + head_seqs[t]
            outs.append(torch.sigmoid(self.predI(x)))
        return outs


class UpWrap(nn.Module):
    def __init__(self, inner):
        super().__init__()
        self.conv2d = inner.conv2d

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        return F.relu6(self.conv2d(x))


CFG_STR = f"""
model = dict(
    type='BDE2VID',
    cpu_cache_length=100,
    generator=dict(
        type='BDE2VIDCrossscalePropogationV5',
        num_bins=5, basechannels={BASE}, num_encoders={ENC}, ks={KS},
        num_res_blocks={NRES}, buffer_index={BUF}, depths={DEPTHS},
        num_heads={HEADS}, window_size=({WIN[0]}, {WIN[1]}),
        drop_path_rate=0.2,
        activation=dict(type='Sigmoid'),
        losses=[],
    ),
)
"""


def test_bde2vid_checkpoint_parity(rng, tmp_path):
    torch.manual_seed(0)
    tnet = TV5().eval()
    wrapper_sd = {f"generator.{k}": v for k, v in tnet.state_dict().items()}
    ckpt = {"meta": {"cfg": CFG_STR}, "state_dict": wrapper_sd}
    path = str(tmp_path / "epoch_1.pth")
    torch.save(ckpt, path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.name == "BDE2VID" and spec.is_sequence_model
    assert spec.num_encoders == ENC

    voxels = rng.normal(size=(T, 1, H, W, 5)).astype(np.float32)
    out, _ = spec.module.apply(spec.params, jnp.asarray(voxels))
    got = np.asarray(out["image"])[:, 0, :, :, 0]

    with torch.no_grad():
        tv = [torch.from_numpy(voxels[t].transpose(0, 3, 1, 2)) for t in range(T)]
        want = torch.cat(tnet(tv))[:, 0].numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.parametrize(
    "win,buf,depths,heads,hw",
    [
        # asymmetric window composed with dilated blocks in the FULL model
        # (the partition/reverse roundtrip test covers them in isolation)
        ((3, 5), [-1, 0, 1], [2, 0, 2], 4, (40, 40)),
        # EVEN window: adjacent dilated windows collide in the fold-sum —
        # .add vs .set divergence only shows composed with the residuals
        ((4, 6), [-2, -1, 0, 1, 2], [0, 2, 2], 2, (48, 48)),
    ],
)
def test_bde2vid_checkpoint_parity_window_variants(
    rng, tmp_path, monkeypatch, win, buf, depths, heads, hw
):
    import tests.test_bde2vid as tb

    for name, val in [("BUF", buf), ("DEPTHS", depths), ("HEADS", heads),
                      ("WIN", win)]:
        monkeypatch.setattr(tb, name, val)
    torch.manual_seed(2)
    tnet = TV5().eval()
    cfg_str = f"""
model = dict(
    type='BDE2VID',
    generator=dict(
        type='BDE2VIDCrossscalePropogationV5',
        num_bins=5, basechannels={BASE}, num_encoders={ENC}, ks={KS},
        num_res_blocks={NRES}, buffer_index={buf}, depths={depths},
        num_heads={heads}, window_size=({win[0]}, {win[1]}),
        drop_path_rate=0.2,
        activation=dict(type='Sigmoid'),
        losses=[],
    ),
)
"""
    ckpt = {
        "meta": {"cfg": cfg_str},
        "state_dict": {f"generator.{k}": v for k, v in tnet.state_dict().items()},
    }
    path = str(tmp_path / "epoch_1.pth")
    torch.save(ckpt, path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    t_steps, (h, w) = 4, hw
    voxels = rng.normal(size=(t_steps, 1, h, w, 5)).astype(np.float32)
    out, _ = spec.module.apply(spec.params, jnp.asarray(voxels))
    got = np.asarray(out["image"])[:, 0, :, :, 0]
    with torch.no_grad():
        tv = [torch.from_numpy(voxels[t].transpose(0, 3, 1, 2))
              for t in range(t_steps)]
        want = torch.cat(tnet(tv))[:, 0].numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_bde2vid_checkpoint_parity_flagship_scale(rng, tmp_path, monkeypatch):
    """Parity at the TRUE flagship config (buffer +-3, depths [4,0,6],
    16 heads, basechannels 32 — bde2vid_cross_scale_propogation_V5.py:19-23)
    on a small spatial size: the deep attention stacks (4 blocks incl. 2
    dilated at level 0; 6 incl. 3 dilated at level 2) and the 16-head masks
    only ever meet the full depth stack here and in the bench. T=8 > 2*3+1
    so interior steps see a full +-3 buffer and edges see zero-padding."""
    fl_base, fl_enc, fl_ks, fl_nres = 32, 3, 5, 2
    fl_buf = [-3, -2, -1, 0, 1, 2, 3]
    fl_depths = [4, 0, 6]
    fl_heads = 16
    import tests.test_bde2vid as tb

    for name, val in [("BASE", fl_base), ("ENC", fl_enc), ("KS", fl_ks),
                      ("NRES", fl_nres), ("BUF", fl_buf),
                      ("DEPTHS", fl_depths), ("HEADS", fl_heads)]:
        monkeypatch.setattr(tb, name, val)
    torch.manual_seed(1)
    tnet = TV5().eval()
    wrapper_sd = {f"generator.{k}": v for k, v in tnet.state_dict().items()}
    cfg_str = f"""
model = dict(
    type='BDE2VID',
    cpu_cache_length=100,
    generator=dict(
        type='BDE2VIDCrossscalePropogationV5',
        num_bins=5, basechannels={fl_base}, num_encoders={fl_enc}, ks={fl_ks},
        num_res_blocks={fl_nres}, buffer_index={fl_buf}, depths={fl_depths},
        num_heads={fl_heads}, window_size=(7, 7),
        drop_path_rate=0.2,
        activation=dict(type='Sigmoid'),
        losses=[],
    ),
)
"""
    ckpt = {"meta": {"cfg": cfg_str}, "state_dict": wrapper_sd}
    path = str(tmp_path / "epoch_1.pth")
    torch.save(ckpt, path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    t_steps, h, w = 8, 56, 56
    voxels = rng.normal(size=(t_steps, 1, h, w, 5)).astype(np.float32)
    out, _ = spec.module.apply(spec.params, jnp.asarray(voxels))
    got = np.asarray(out["image"])[:, 0, :, :, 0]

    with torch.no_grad():
        tv = [torch.from_numpy(voxels[t].transpose(0, 3, 1, 2))
              for t in range(t_steps)]
        want = torch.cat(tnet(tv))[:, 0].numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_bde2vid_batch_independence(rng):
    """Batch items must not leak into each other: the window partition /
    attention reshapes fold (T, N) and window axes — a wrong reshape would
    mix batch elements. Changing batch item 1 must leave item 0's outputs
    bit-identical. (An identical-inputs determinism check cannot catch
    this; it passes for any pure function.)"""
    cfg = {"generator": {"num_bins": 5, "basechannels": 8, "num_encoders": 2,
                         "ks": 5, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [2, 2], "num_heads": 4, "window_size": [7, 7]}}
    m = build_model("BDE2VID", cfg)
    v = jnp.asarray(rng.normal(size=(4, 2, 28, 28, 5)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), v)
    a, _ = m.apply(params, v)
    v2 = v.at[:, 1].set(jnp.asarray(rng.normal(size=(4, 28, 28, 5)).astype(np.float32)))
    b, _ = m.apply(params, v2)
    np.testing.assert_array_equal(
        np.asarray(a["image"][:, 0]), np.asarray(b["image"][:, 0])
    )
    assert np.abs(np.asarray(a["image"][:, 1]) - np.asarray(b["image"][:, 1])).max() > 1e-6


def test_bde2vid_concat_and_no_rc(rng):
    """Config variants: skip_type='concat' (fusion convs in decode) and
    useRC=False (plain conv encoders) must build and run."""
    cfg = {"generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [1, 1], "num_heads": 2, "window_size": [4, 4],
                         "skip_type": "concat", "useRC": False}}
    m = build_model("BDE2VID", cfg)
    v = jnp.asarray(rng.normal(size=(3, 1, 16, 16, 5)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), v)
    out, _ = m.apply(params, v)
    assert out["image"].shape == (3, 1, 16, 16, 1)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_bde2vid_depth0_fallback_resblocks(rng):
    """depths all zero: the last level substitutes norm-free resblocks on
    buffer frame 0 (reference V5:82-85 ParseLayer + ResidualBlockNoBN)."""
    cfg = {"generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 2, "buffer_index": [-1, 0, 1],
                         "depths": [0, 0], "num_heads": 2, "window_size": [4, 4]}}
    m = build_model("BDE2VID", cfg)
    v = jnp.asarray(rng.normal(size=(3, 1, 16, 16, 5)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), v)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = "/".join(str(p) for p, _ in flat)
    assert "res1" in names and "res2" in names  # fallback blocks exist
    out, _ = m.apply(params, v)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_parallel_attention_equals_sequential_when_buffer_is_self(rng):
    """With buffer_index=[0] every frame attends only to itself, so the
    sequential in-place semantics and the parallel fast mode coincide."""
    base = {"num_bins": 5, "basechannels": 4, "num_encoders": 2, "ks": 3,
            "num_res_blocks": 1, "buffer_index": [0], "q_idx": 0,
            "depths": [1, 1], "num_heads": 2, "window_size": [4, 4]}
    m_seq = build_model("BDE2VID", {"generator": dict(base)})
    m_par = build_model("BDE2VID", {"generator": dict(base, parallel_attention=True)})
    v = jnp.asarray(rng.normal(size=(4, 1, 16, 16, 5)).astype(np.float32))
    params = m_seq.init(jax.random.PRNGKey(0), v)
    a, _ = m_seq.apply(params, v)
    b, _ = m_par.apply(params, v)
    np.testing.assert_allclose(
        np.asarray(a["image"]), np.asarray(b["image"]), atol=1e-5
    )


def test_bde2vid_nwindow_kv_reduction(rng):
    """nwindow_size KV token reduction (reference WindowAttention3D
    reduction_conv, DTransformer.py:129,172-176) builds and runs; the
    grouped conv reduces each window's kv to nwin tokens."""
    cfg = {"generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                         "ks": 3, "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
                         "depths": [1, 1], "num_heads": 2, "window_size": [4, 4],
                         "nwindow_size": [2, 2]}}
    m = build_model("BDE2VID", cfg)
    v = jnp.asarray(rng.normal(size=(3, 1, 16, 16, 5)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), v)
    names = "/".join(str(p) for p, _ in jax.tree_util.tree_leaves_with_path(params))
    assert "reduction_conv" in names
    out, _ = m.apply(params, v)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_bf16_pallas_fast_path_drift(rng):
    """The throughput config (bf16 + fused Pallas attention) must stay within
    bf16 noise of the f32 parity path on shared params."""
    base = {"num_bins": 5, "basechannels": 8, "num_encoders": 2, "ks": 3,
            "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
            "depths": [1, 1], "num_heads": 4, "window_size": [7, 7]}
    m32 = build_model("BDE2VID", {"generator": dict(base)})
    m16 = build_model(
        "BDE2VID", {"generator": dict(base, use_pallas_attention=True)},
        dtype=jnp.bfloat16,
    )
    v = jnp.asarray(rng.normal(size=(3, 1, 28, 28, 5)).astype(np.float32))
    params = m32.init(jax.random.PRNGKey(0), v)
    a = np.asarray(m32.apply(params, v)[0]["image"], np.float32)
    b = np.asarray(m16.apply(params, v)[0]["image"], np.float32)
    assert np.abs(a - b).max() < 0.05  # sigmoid-output scale, bf16 noise


@pytest.mark.parametrize("win", [(4, 4), (7, 7), (3, 5), (4, 6)])
def test_dilated_window_roundtrip_matches_torch_fold(rng, win):
    """partition_dilated -> reverse_dilated must equal torch
    F.unfold(dilation=2) -> F.fold (which SUMS overlapping taps — for even
    windows adjacent dilated windows collide, so a .set-based scatter would
    be last-writer-wins and wrong)."""
    from bde2vid_tpu.nn.window_attention import (
        window_partition_dilated,
        window_reverse_dilated,
    )

    wh, ww = win
    D, B, C = 1, 1, 3  # reverse consumes one frame slice (the center)
    # pad H, W to window multiples (the block pads before partitioning)
    H = wh * 4
    W = ww * 3
    x = rng.normal(size=(D, B, C, H, W)).astype(np.float32)

    tw = t_window_partition(torch.from_numpy(x), win, dilate=True)
    twr = t_window_reverse(tw.reshape(-1, C, wh, ww), B, H, W, dilate=True)
    want = twr.numpy()  # (B, C, H, W)

    jw = window_partition_dilated(
        jnp.asarray(x.transpose(0, 1, 3, 4, 2)), win
    )  # (D, B*nW, wh, ww, C)
    np.testing.assert_allclose(
        np.asarray(jw).transpose(0, 1, 4, 2, 3), tw.numpy(), atol=1e-6
    )
    jr = window_reverse_dilated(jw.reshape(-1, wh, ww, C), B, H, W)
    np.testing.assert_allclose(
        np.asarray(jr).transpose(0, 3, 1, 2), want, atol=1e-6
    )


@pytest.mark.parametrize("win", [(4, 4), (7, 7), (3, 5)])
def test_dilated_window_glue_grads_match_torch(rng, win):
    """Gradients through partition_dilated -> reverse_dilated must equal
    torch autograd through unfold/fold. Covers the r5 injective-take custom
    VJP (odd windows: the backward is a gather with the inverse map, NOT
    XLA's default scatter-add transpose — scatters serialize on TPU and
    cost ~5 ms/step of flagship training) and the even-window scatter-add
    fallback."""
    from bde2vid_tpu.nn.window_attention import (
        window_partition_dilated,
        window_reverse_dilated,
    )

    wh, ww = win
    D, B, C = 1, 1, 3
    H, W = wh * 4, ww * 3
    x = rng.normal(size=(D, B, C, H, W)).astype(np.float32)
    # random cotangent so every output position's adjoint path is exercised
    gw = rng.normal(size=(B, C, H, W)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    tw = t_window_partition(xt, win, dilate=True)
    twr = t_window_reverse(tw.reshape(-1, C, wh, ww), B, H, W, dilate=True)
    (twr * torch.from_numpy(gw)).sum().backward()
    want = xt.grad.numpy()

    def loss(xj):
        jw = window_partition_dilated(xj, win)
        jr = window_reverse_dilated(jw.reshape(-1, wh, ww, C), B, H, W)
        return jnp.sum(jr * jnp.asarray(gw.transpose(0, 2, 3, 1)))

    g = jax.grad(loss)(jnp.asarray(x.transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(
        np.asarray(g).transpose(0, 1, 4, 2, 3), want, atol=1e-5
    )


def test_bde2vid_norm_decoder_has_norm_layers(rng):
    """norm='BN'/'IN' must normalize the DECODER convs too (the reference
    decoder UpsampleConvLayer takes norm=norm, V5:84-86 + submodules
    :105-110) — previously the decode stack silently dropped it."""
    from bde2vid_tpu.eval.checkpoint import _bde2vid_path_fixup

    for norm in ("BN", "IN"):
        cfg = {"generator": {"num_bins": 5, "basechannels": 4, "num_encoders": 2,
                             "ks": 3, "num_res_blocks": 1, "norm": norm,
                             "buffer_index": [-1, 0, 1], "depths": [1, 1],
                             "num_heads": 2, "window_size": [4, 4]}}
        model = build_model("BDE2VID", cfg)
        voxels = jnp.asarray(rng.normal(size=(2, 1, 16, 16, 5)).astype(np.float32))
        tree = model.init(jax.random.PRNGKey(0), voxels)
        flat = {"/".join(map(str, p)) for p, _ in
                jax.tree_util.tree_flatten_with_path(tree)[0]}
        joined = " ".join(flat)
        assert "decoder01_norm" in joined and "decoder11_norm" in joined, norm
        out, _ = model.apply(tree, voxels)
        assert np.isfinite(np.asarray(out["image"])).all()

    # converter fixup: torch decoders.N.1.norm_layer.* -> decode/decoderN1_norm
    assert _bde2vid_path_fixup(("generator", "decoder01", "norm_layer")) == (
        "generator", "decode", "decoder01_norm")
    # predI and the concat-fusion slot 0 have no norm in the reference;
    # their paths pass through unchanged
    assert _bde2vid_path_fixup(("generator", "predI1",)) == (
        "generator", "decode", "predI1")


def test_nwindow_kv_reduction_matches_torch(rng):
    """NUMERICAL oracle for the KV token-reduction path (reference
    WindowAttention3D reduction_conv + the quirky group-major channel/token
    reshape, DTransformer.py:129,172-176, and the bias-table column slice
    [:N] at :195-197): torch replica vs flax on shared weights. The smoke
    test above only checks finiteness — a transposed grouped-conv layout or
    wrong bias columns would pass it."""
    from bde2vid_tpu.nn.window_attention import WindowAttention3D

    torch.manual_seed(3)
    D, B_, WH, WW, C, HEADS_, NW = 3, 2, 5, 5, 8, 2, (2, 2)
    ntok = NW[0] * NW[1]

    class TRedAttn(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm_q = nn.LayerNorm(C)
            self.norm_kv = nn.LayerNorm(C)
            self.reduction_conv = nn.Conv2d(C, ntok * C, (WH, WW), groups=C)
            self.q = nn.Linear(C, C, bias=True)
            self.kv = nn.Linear(C, 2 * C, bias=True)
            self.proj = nn.Linear(C, C)
            self.table = nn.Parameter(
                torch.randn((2 * D - 1) * (2 * WH - 1) * (2 * WW - 1), HEADS_) * 0.02
            )
            coords = torch.stack(
                torch.meshgrid(torch.arange(D), torch.arange(WH), torch.arange(WW),
                               indexing="ij")).flatten(1)
            rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0).contiguous()
            rel[:, :, 0] += D - 1
            rel[:, :, 1] += WH - 1
            rel[:, :, 2] += WW - 1
            rel[:, :, 0] *= (2 * WH - 1) * (2 * WW - 1)
            rel[:, :, 1] *= 2 * WW - 1
            self.register_buffer("idx", rel.sum(-1))
            self.q_ind = D // 2

        def forward(self, x):  # (D, B_, C, H, W)
            d, b_, c, hh, ww = x.shape
            kv = self.reduction_conv(x.reshape(-1, c, hh, ww))  # (-1, C*ntok, 1, 1)
            kv = kv.view(d, b_, ntok, c)  # the reference's mixing reshape
            q = x[self.q_ind].permute(0, 2, 3, 1).reshape(b_, -1, c)
            kv = kv.permute(1, 0, 2, 3).reshape(b_, -1, c)
            q = self.norm_q(q)
            kv = self.norm_kv(kv)
            m = q.shape[1]
            n = kv.shape[1]
            hd = c // HEADS_
            qh = self.q(q).reshape(b_, m, HEADS_, hd).permute(0, 2, 1, 3)
            kvh = self.kv(kv).reshape(b_, n, 2, HEADS_, hd).permute(2, 0, 3, 1, 4)
            k, v = kvh[0], kvh[1]
            attn = (qh * hd**-0.5) @ k.transpose(-2, -1)
            qs = self.q_ind * WH * WW
            bias = self.table[self.idx[qs : qs + WH * WW, :n].reshape(-1)].reshape(m, n, -1)
            attn = (attn + bias.permute(2, 0, 1).unsqueeze(0)).softmax(-1)
            out = (attn @ v).transpose(1, 2).reshape(b_, m, c)
            return self.proj(out).view(b_, WH, WW, c)

    tnet = TRedAttn().eval()
    fnet = WindowAttention3D(C, (D, WH, WW), HEADS_, nwin_size=NW, qkv_bias=True)
    x = rng.normal(size=(D, B_, WH, WW, C)).astype(np.float32)
    fparams = fnet.init(jax.random.PRNGKey(0), jnp.asarray(x))

    t2n = lambda t: t.detach().numpy()
    p = dict(fparams["params"])
    p["norm_q"] = {"scale": t2n(tnet.norm_q.weight), "bias": t2n(tnet.norm_q.bias)}
    p["norm_kv"] = {"scale": t2n(tnet.norm_kv.weight), "bias": t2n(tnet.norm_kv.bias)}
    p["q"] = {"kernel": t2n(tnet.q.weight).T, "bias": t2n(tnet.q.bias)}
    p["kv"] = {"kernel": t2n(tnet.kv.weight).T, "bias": t2n(tnet.kv.bias)}
    p["proj"] = {"kernel": t2n(tnet.proj.weight).T, "bias": t2n(tnet.proj.bias)}
    p["relative_position_bias_table"] = t2n(tnet.table)
    p["reduction_conv"] = {
        "kernel": t2n(tnet.reduction_conv.weight).transpose(2, 3, 1, 0),
        "bias": t2n(tnet.reduction_conv.bias),
    }
    got = np.asarray(fnet.apply({"params": p}, jnp.asarray(x)))  # (B_, WH, WW, C)
    with torch.no_grad():
        want = t2n(tnet(torch.from_numpy(x.transpose(0, 1, 4, 2, 3))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_bde2vid_rejects_no_skip():
    """'no_skip' exists in the reference config surface but its Identity is
    called with two args — a TypeError upstream, so no checkpoint carries
    it; we fail loudly instead of silently substituting sum."""
    with pytest.raises(ValueError, match="skip_type"):
        m = build_model("BDE2VID", {"generator": {"skip_type": "no_skip"}})
        m.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, 16, 16, 5)))


def test_pallas_full_model_matches_xla_f32(rng):
    """use_pallas_attention (the whole-block fused kernel, interpret mode on
    CPU) must match the XLA path at f32 on shared params through the FULL
    model — depths [2,2] covers regular AND dilated blocks."""
    base = {"num_bins": 5, "basechannels": 8, "num_encoders": 2, "ks": 3,
            "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
            "depths": [2, 2], "num_heads": 4, "window_size": [7, 7]}
    m_xla = build_model("BDE2VID", {"generator": dict(base)})
    m_pal = build_model(
        "BDE2VID", {"generator": dict(base, use_pallas_attention=True)}
    )
    v = jnp.asarray(rng.normal(size=(3, 1, 28, 28, 5)).astype(np.float32))
    params = m_xla.init(jax.random.PRNGKey(0), v)
    a = np.asarray(m_xla.apply(params, v)[0]["image"])
    b = np.asarray(m_pal.apply(params, v)[0]["image"])
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)


def test_parallel_attention_pallas_matches_parallel_xla(rng):
    """parallel_attention with the fused kernel == parallel_attention with
    the XLA path (same non-parity semantics, shared params)."""
    base = {"num_bins": 5, "basechannels": 8, "num_encoders": 2, "ks": 3,
            "num_res_blocks": 1, "buffer_index": [-1, 0, 1],
            "depths": [2, 2], "num_heads": 4, "window_size": [7, 7],
            "parallel_attention": True}
    m_xla = build_model("BDE2VID", {"generator": dict(base)})
    m_pal = build_model(
        "BDE2VID", {"generator": dict(base, use_pallas_attention=True)}
    )
    v = jnp.asarray(rng.normal(size=(3, 1, 28, 28, 5)).astype(np.float32))
    params = m_xla.init(jax.random.PRNGKey(0), v)
    a = np.asarray(m_xla.apply(params, v)[0]["image"])
    b = np.asarray(m_pal.apply(params, v)[0]["image"])
    np.testing.assert_allclose(b, a, atol=2e-5, rtol=1e-4)
