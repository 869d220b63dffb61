"""SPADE-E2VID tests: checkpoint conversion parity vs a torch Unet6 replica."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bde2vid_tpu.models import build_model


class TSpadeRec(nn.Module):
    def __init__(self, ci, co, stride):
        super().__init__()
        self.conv0 = nn.Conv2d(ci, co, 5, stride, 2, bias=False)
        self.bn = nn.BatchNorm2d(co)
        g = nn.Module()
        g.Gates = nn.Conv2d(2 * co, 4 * co, 3, padding=1)
        self.recurrent_block = g

    def forward(self, x, state):
        x = torch.relu(self.bn(self.conv0(x)))
        h, c = state
        i, f, o, gg = self.recurrent_block.Gates(torch.cat([x, h], 1)).chunk(4, 1)
        c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(gg)
        h = torch.sigmoid(o) * torch.tanh(c)
        return h, (h, c)


class TSpadeRes(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.bn2 = nn.BatchNorm2d(c)

    def forward(self, x):
        y = torch.relu(self.bn1(self.conv1(x)))
        return torch.relu(self.bn2(self.conv2(y)) + x)


class TSPADE(nn.Module):
    def __init__(self, norm_nc, nhidden=64):
        super().__init__()
        self.param_free_norm = nn.BatchNorm2d(norm_nc, affine=False)
        self.mlp_shared = nn.Sequential(nn.Conv2d(3, nhidden, 3, padding=1), nn.ReLU())
        self.mlp_gamma = nn.Conv2d(nhidden, norm_nc, 3, padding=1)
        self.mlp_beta = nn.Conv2d(nhidden, norm_nc, 3, padding=1)

    def forward(self, x, seg):
        n = self.param_free_norm(x)
        seg = F.interpolate(seg, size=x.shape[-2:], mode="nearest")
        a = self.mlp_shared(seg)
        return n * (1 + self.mlp_gamma(a)) + self.mlp_beta(a)


class TUp3(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv0 = nn.Conv2d(ci, co * 4, 3, padding=1, bias=False)
        self.norm = TSPADE(co)

    def forward(self, x, x_org):
        x = F.pixel_shuffle(self.conv0(x), 2)
        return torch.relu(self.norm(x, x_org))


class TUnet6(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc = nn.Conv2d(5, 32, 5, padding=2)
        self.rec0 = TSpadeRec(32, 64, 1)
        self.rec1 = TSpadeRec(64, 128, 2)
        self.rec2 = TSpadeRec(128, 256, 2)
        self.res0 = TSpadeRes(256)
        self.res1 = TSpadeRes(256)
        self.up0 = TUp3(256, 128)
        self.up1 = TUp3(128, 64)
        self.up2 = TSpadeRec(64, 32, 1)
        self.conv_img = nn.Conv2d(32, 3, 1)
        self.bn_img = nn.BatchNorm2d(3)

    def forward(self, x, states, pred):
        head = torch.relu(self.fc(x))
        x0, s0 = self.rec0(head, states[0])
        x1, s1 = self.rec1(x0, states[1])
        x2, s2 = self.rec2(x1, states[2])
        y = self.res1(self.res0(x2))
        y = self.up0(y + x2, pred)
        y = self.up1(y + x1, pred)
        y, s3 = self.up2(y + x0, states[3])
        img = self.conv_img(torch.relu(y + head))
        return torch.sigmoid(self.bn_img(img)), (s0, s1, s2, s3)


def test_spade_checkpoint_parity(rng, tmp_path):
    torch.manual_seed(0)
    tnet = TUnet6().eval()
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.7, 1.5)
    path = str(tmp_path / "SPADE_E2VID.pth")
    torch.save(tnet.state_dict(), path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.name == "SPADEE2VID" and spec.num_encoders == 3
    assert getattr(spec, "normalize", False)

    H, W = 32, 40
    voxel = rng.normal(size=(1, H, W, 5)).astype(np.float32)

    state = spec.module.initial_state(1, H, W)
    out1, state = spec.module.apply(spec.params, jnp.asarray(voxel), state)
    out2, _ = spec.module.apply(spec.params, jnp.asarray(voxel), state)

    # torch path replicating the SPADEE2VID wrapper (spade_e2v.py:25-37)
    t = torch.from_numpy(voxel.transpose(0, 3, 1, 2))
    pred = t[:, :3].clone()
    if pred.max() != 0:
        pred -= pred.min()
        pred /= pred.max()
    z = lambda c, h, w: (torch.zeros(1, c, h, w), torch.zeros(1, c, h, w))
    states = (z(64, H, W), z(128, H // 2, W // 2), z(256, H // 4, W // 4), z(32, H, W))
    with torch.no_grad():
        for rep, out in enumerate((out1, out2)):
            pred, states = tnet(t, states, pred)
            gray = (
                0.299 * pred[:, 2] + 0.587 * pred[:, 1] + 0.114 * pred[:, 0]
            ).numpy()[0]
            got = np.asarray(out["image"])[0, :, :, 0]
            np.testing.assert_allclose(got, gray, atol=5e-4)


def test_spade_bootstraps_pred_from_voxel(rng):
    m = build_model("SPADEE2VID", {})
    st = m.initial_state(1, 32, 40)
    v = jnp.asarray(rng.normal(size=(1, 32, 40, 5)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), v, st)
    _, st2 = m.apply(params, v, st)
    assert bool(st2["initialized"])
    assert np.abs(np.asarray(st2["pred"])).sum() > 0
