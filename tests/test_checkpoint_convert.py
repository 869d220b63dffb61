"""Checkpoint conversion parity: torch models -> flax params -> same outputs.

The torch models here are built from the architecture spec with the exact
state-dict key layout reference checkpoints use (unetrecurrent.head.conv2d...,
encoders.N.recurrent_block.Gates..., decoders.N.conv2d...). Converting those
state dicts and comparing multi-step outputs validates every mapping rule the
real BDE2VID/E2VID .pth files will exercise.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bde2vid_tpu.eval.checkpoint import (
    _build_spec,
    convert_state_dict,
    fill_params,
)
from bde2vid_tpu.eval.mmengine_cfg import parse_embedded_cfg
from bde2vid_tpu.models.api import run_sequence

ATOL = 5e-5


# ---------------- torch reference-style modules (spec-built) ----------------


class TConvLayer(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, act="relu"):
        super().__init__()
        self.conv2d = nn.Conv2d(cin, cout, k, stride, padding)
        self.act = act

    def forward(self, x):
        y = self.conv2d(x)
        return torch.relu(y) if self.act == "relu" else y


class TConvLSTM(nn.Module):
    def __init__(self, size, k=3):
        super().__init__()
        self.Gates = nn.Conv2d(2 * size, 4 * size, k, padding=k // 2)

    def forward(self, x, state):
        h, c = state
        g = self.Gates(torch.cat([x, h], 1))
        i, f, o, gg = g.chunk(4, 1)
        c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(gg)
        h = torch.sigmoid(o) * torch.tanh(c)
        return h, (h, c)


class TRecurrentConvLayer(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConvLayer(cin, cout, 5, 2, 2)
        self.recurrent_block = TConvLSTM(cout)

    def forward(self, x, state):
        x = self.conv(x)
        return self.recurrent_block(x, state)


class TResBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        y = torch.relu(self.conv1(x))
        return torch.relu(self.conv2(y) + x)


class TUpsampleConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv2d = nn.Conv2d(cin, cout, 5, padding=2)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        return torch.relu(self.conv2d(x))


class TUNetRecurrent(nn.Module):
    """Key-compatible with reference UNetRecurrent (skip_type=sum)."""

    def __init__(self, num_bins=5, base=8, num_enc=2, num_res=1):
        super().__init__()
        self.num_enc = num_enc
        self.head = TConvLayer(num_bins, base, 5, 1, 2)
        sizes = [base * 2**i for i in range(num_enc + 1)]
        self.encoders = nn.ModuleList(
            [TRecurrentConvLayer(sizes[i], sizes[i + 1]) for i in range(num_enc)]
        )
        self.resblocks = nn.ModuleList([TResBlock(sizes[-1]) for _ in range(num_res)])
        self.decoders = nn.ModuleList(
            [TUpsampleConv(sizes[num_enc - i], sizes[num_enc - i] // 2) for i in range(num_enc)]
        )
        self.pred = TConvLayer(base, 1, 1, 1, 0, act=None)

    def forward(self, x, states):
        x = self.head(x)
        head = x
        blocks, new_states = [], []
        for i, enc in enumerate(self.encoders):
            x, st = enc(x, states[i])
            blocks.append(x)
            new_states.append(st)
        for rb in self.resblocks:
            x = rb(x)
        for i, dec in enumerate(self.decoders):
            x = dec(x + blocks[self.num_enc - i - 1])
        return torch.sigmoid(self.pred.conv2d(x + head)), new_states


class TWrap(nn.Module):
    def __init__(self, **kw):
        super().__init__()
        self.unetrecurrent = TUNetRecurrent(**kw)


def _torch_states(b, h, w, base, num_enc):
    states = []
    for i in range(num_enc):
        h, w = (h - 1) // 2 + 1, (w - 1) // 2 + 1
        c = base * 2 ** (i + 1)
        z = torch.zeros(b, c, h, w)
        states.append((z, z.clone()))
    return states


def test_e2vid_recurrent_checkpoint_parity(rng, tmp_path):
    torch.manual_seed(0)
    tmodel = TWrap(num_bins=5, base=8, num_enc=2, num_res=1)
    tmodel.eval()
    ckpt = {
        "arch": "E2VIDRecurrent",
        "config": {
            "arch": {
                "args": {
                    "unet_kwargs": {
                        "num_bins": 5,
                        "base_num_channels": 8,
                        "num_encoders": 2,
                        "num_residual_blocks": 1,
                        "skip_type": "sum",
                        "recurrent_block_type": "convlstm",
                    }
                }
            }
        },
        "state_dict": tmodel.state_dict(),
    }
    path = str(tmp_path / "e2vid.pth")
    torch.save(ckpt, path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.num_encoders == 2

    H, W, T = 32, 48, 3
    voxels = rng.normal(size=(T, 1, H, W, 5)).astype(np.float32)
    imgs, _ = run_sequence(
        spec.module, spec.params, jnp.asarray(voxels), spec.module.initial_state(1, H, W)
    )
    got = np.asarray(imgs)[:, 0, :, :, 0]

    with torch.no_grad():
        st = _torch_states(1, H, W, 8, 2)
        want = []
        for t in range(T):
            x = torch.from_numpy(voxels[t].transpose(0, 3, 1, 2))
            y, st = tmodel.unetrecurrent(x, st)
            want.append(y[0, 0].numpy())
    want = np.stack(want)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_strict_conversion_catches_mismatch(rng):
    sd = {"unetrecurrent.head.conv2d.weight": np.zeros((8, 5, 5, 5), np.float32)}
    conv = convert_state_dict(sd)
    init = {"params": {"unetrecurrent": {"head": {"conv": {
        "kernel": np.zeros((5, 5, 5, 8), np.float32),
        "bias": np.zeros((8,), np.float32),
    }}}}}
    with pytest.raises(ValueError, match="mismatch"):
        fill_params(init, conv)


def test_parse_embedded_cfg():
    cfg = """
base_ch = 32
model = dict(
    type='BDE2VID',
    generator=dict(type='BDE2VIDCrossscalePropogationV5',
                   basechannels=base_ch, num_encoders=3),
)
"""
    model = parse_embedded_cfg(cfg)
    assert model["type"] == "BDE2VID"
    assert model["generator"]["basechannels"] == 32


def test_bn_stats_mapping():
    sd = {
        "m.norm_layer.weight": np.ones(4, np.float32),
        "m.norm_layer.bias": np.zeros(4, np.float32),
        "m.norm_layer.running_mean": np.full(4, 0.5, np.float32),
        "m.norm_layer.running_var": np.full(4, 2.0, np.float32),
        "m.norm_layer.num_batches_tracked": np.array(7),
    }
    tree = convert_state_dict(sd)
    assert tree["params"]["m"]["norm_layer"]["scale"].shape == (4,)
    np.testing.assert_array_equal(tree["batch_stats"]["m"]["norm_layer"]["mean"], 0.5)
    np.testing.assert_array_equal(tree["batch_stats"]["m"]["norm_layer"]["var"], 2.0)


class TFireNet(torch.nn.Module):
    """Key-compatible refactored FireNet (reference e2vid/model.py:120-168)."""

    def __init__(self, nbins=5, c=8, k=3):
        super().__init__()
        mkc = lambda ci, co, kk: torch.nn.Conv2d(ci, co, kk, padding=kk // 2)
        head = torch.nn.Module(); head.conv2d = mkc(nbins, c, k); self.head = head
        for g in ("G1", "G2"):
            gm = torch.nn.Module()
            gm.reset_gate = mkc(2 * c, c, k)
            gm.update_gate = mkc(2 * c, c, k)
            gm.out_gate = mkc(2 * c, c, k)
            setattr(self, g, gm)
        for r in ("R1", "R2"):
            rm = torch.nn.Module()
            rm.conv1 = torch.nn.Conv2d(c, c, 3, padding=1)
            rm.conv2 = torch.nn.Conv2d(c, c, 3, padding=1)
            setattr(self, r, rm)
        pred = torch.nn.Module(); pred.conv2d = torch.nn.Conv2d(c, 1, 1); self.pred = pred

    def gru(self, g, x, h):
        z = torch.sigmoid(g.update_gate(torch.cat([x, h], 1)))
        r = torch.sigmoid(g.reset_gate(torch.cat([x, h], 1)))
        cand = torch.tanh(g.out_gate(torch.cat([x, h * r], 1)))
        return h * (1 - z) + cand * z

    def res(self, r, x):
        return torch.relu(r.conv2(torch.relu(r.conv1(x))) + x)

    def forward(self, x, h1, h2):
        x = torch.relu(self.head.conv2d(x))
        h1 = self.gru(self.G1, x, h1)
        x = self.res(self.R1, h1)
        h2 = self.gru(self.G2, x, h2)
        x = self.res(self.R2, h2)
        return self.pred.conv2d(x), h1, h2


def test_firenet_checkpoint_parity(rng, tmp_path):
    """FireNet uses the kwargs-style dialect (arch == 'FireNet' is called
    with **model_args, eval_models_seq.py:82-83)."""
    torch.manual_seed(0)
    tnet = TFireNet().eval()
    ckpt = {
        "arch": "FireNet",
        "config": {"arch": {"args": {"unet_kwargs": {
            "num_bins": 5, "base_num_channels": 8, "kernel_size": 3}}}},
        "state_dict": tnet.state_dict(),
    }
    path = str(tmp_path / "firenet.pth")
    torch.save(ckpt, path)
    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.name == "FireNet" and spec.num_encoders == 0

    H, W = 24, 32
    voxel = rng.normal(size=(1, H, W, 5)).astype(np.float32)
    state = spec.module.initial_state(1, H, W)
    out, state = spec.module.apply(spec.params, jnp.asarray(voxel), state)
    out2, _ = spec.module.apply(spec.params, jnp.asarray(voxel), state)

    with torch.no_grad():
        h1 = torch.zeros(1, 8, H, W); h2 = torch.zeros(1, 8, H, W)
        tx = torch.from_numpy(voxel.transpose(0, 3, 1, 2))
        w1, h1, h2 = tnet(tx, h1, h2)
        w2, h1, h2 = tnet(tx, h1, h2)
    np.testing.assert_allclose(
        np.asarray(out["image"])[0, :, :, 0], w1[0, 0].numpy(), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out2["image"])[0, :, :, 0], w2[0, 0].numpy(), atol=5e-5
    )


def test_firenet_1000_dialect(rng, tmp_path):
    """The firenet_1000.pth special case reads config['model'] and builds
    FireNetOrg (eval_models_seq.py:46-50)."""
    import torch.nn as nn

    c, k = 8, 3

    class TUNetFire(nn.Module):
        def __init__(self):
            super().__init__()
            head = nn.Module()
            conv = nn.Module(); conv.conv2d = nn.Conv2d(5, c, k, padding=1)
            head.conv = conv
            rec = nn.Module()
            rec.reset_gate = nn.Conv2d(2 * c, c, 3, padding=1)
            rec.update_gate = nn.Conv2d(2 * c, c, 3, padding=1)
            rec.out_gate = nn.Conv2d(2 * c, c, 3, padding=1)
            head.recurrent_block = rec
            self.head = head
            rb = nn.Module()
            inner = nn.Module()
            inner.conv1 = nn.Conv2d(c, c, 3, padding=1)
            inner.conv2 = nn.Conv2d(c, c, 3, padding=1)
            rb.conv = inner
            rec2 = nn.Module()
            rec2.reset_gate = nn.Conv2d(2 * c, c, 3, padding=1)
            rec2.update_gate = nn.Conv2d(2 * c, c, 3, padding=1)
            rec2.out_gate = nn.Conv2d(2 * c, c, 3, padding=1)
            rb.recurrent_block = rec2
            rb2 = nn.Module()
            rb2.conv1 = nn.Conv2d(c, c, 3, padding=1)
            rb2.conv2 = nn.Conv2d(c, c, 3, padding=1)
            self.resblocks = nn.ModuleList([rb, rb2])
            pred = nn.Module(); pred.conv2d = nn.Conv2d(c, 1, 1)
            self.pred = pred

    torch.manual_seed(0)
    tnet = TUNetFire()
    wrapper_sd = {f"net.{kk}": v for kk, v in tnet.state_dict().items()}
    ckpt = {
        "config": {"model": {"num_bins": 5, "base_num_channels": c,
                             "kernel_size": 3, "num_residual_blocks": 2,
                             "recurrent_blocks": {"resblock": [0]}}},
        "state_dict": wrapper_sd,
    }
    path = str(tmp_path / "firenet_1000.pth")
    torch.save(ckpt, path)
    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.name == "FireNetOrg"
    voxel = jnp.asarray(rng.normal(size=(1, 16, 16, 5)).astype(np.float32))
    out, _ = spec.module.apply(spec.params, voxel, spec.module.initial_state(1, 16, 16))
    assert np.isfinite(np.asarray(out["image"])).all()


def test_parse_embedded_cfg_free_variables():
    """Module-exec semantics: functions/comprehensions in the config must
    resolve top-level config variables (exec with split globals/locals
    breaks this — free names are looked up in globals only)."""
    cfg = (
        "base = 16\n"
        "chans = [base * 2 ** i for i in range(3)]\n"
        "pick = lambda: base\n"
        "model = dict(type='BDE2VID', basechannels=pick(), enc=chans)\n"
    )
    model = parse_embedded_cfg(cfg)
    assert model["basechannels"] == 16
    assert model["enc"] == [16, 32, 64]


def test_parse_embedded_cfg_realistic_training_dialect():
    """A realistic mmengine cfg string of the shape a real BDE2VID.pth
    embeds: loss dicts (incl. nested args), activation dict, training-side
    sections, comments, and derived variables — the converter must pull
    the generator config out intact and ignore the rest."""
    cfg = """
# training config (written by mmengine Config.dump)
base_ch = 32
buffer = [-3, -2, -1, 0, 1, 2, 3]
model = dict(
    type='BDE2VID',
    cpu_cache_length=100,
    generator=dict(
        type='BDE2VIDCrossscalePropogationV5',
        num_bins=5, basechannels=base_ch, num_encoders=3, ks=5,
        num_res_blocks=2, buffer_index=buffer, depths=[4, 0, 6],
        num_heads=16, window_size=(7, 7), drop_path_rate=0.2,
        use_checkpoint=False,
        activation=dict(type='Sigmoid'),
        losses=[
            dict(type='PerceptualLoss', weight=1.0),
            dict(type='L1Loss', weight=20.0),
            dict(type='TemporalConsistencyLoss', L0=2),
        ],
        loss_inds=2,
    ),
)
optimizer = dict(type='Adam', lr=1e-4)
train_dataloader = dict(batch_size=2, num_workers=4)
"""
    model = parse_embedded_cfg(cfg)
    gen = model["generator"]
    assert gen["basechannels"] == 32
    assert gen["buffer_index"] == [-3, -2, -1, 0, 1, 2, 3]
    assert gen["losses"][1] == {"type": "L1Loss", "weight": 20.0}
    assert gen["activation"] == {"type": "Sigmoid"}
    assert model["cpu_cache_length"] == 100
    # the full model still builds from this config (loss/train keys and
    # use_checkpoint are inert at inference)
    from bde2vid_tpu.models import build_model

    m = build_model("BDE2VID", model)
    import jax
    import jax.numpy as jnp

    v = jnp.zeros((2, 1, 16, 16, 5))
    params = m.init(jax.random.PRNGKey(0), v)
    out, _ = m.apply(params, v)
    assert out["image"].shape == (2, 1, 16, 16, 1)
