"""Spiking neuron + EVSNN tests: neuron math, surrogate gradient, and full
checkpoint-conversion parity vs a torch EVSNN replica."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bde2vid_tpu.models import build_model
from bde2vid_tpu.nn.spiking import (
    atan_spike,
    if_step,
    lif_step,
    mp_ada_lif_step,
    mp_lif_step,
)

# ------------------------------ neuron math ---------------------------------


def test_atan_spike_forward_is_heaviside():
    x = jnp.asarray([-1.0, -1e-6, 0.0, 1e-6, 3.0])
    np.testing.assert_array_equal(np.asarray(atan_spike(x)), [0, 0, 1, 1, 1])


def test_atan_spike_gradient():
    alpha = 2.0
    xs = np.linspace(-2, 2, 9).astype(np.float32)
    g = jax.vmap(jax.grad(lambda x: atan_spike(x, alpha)))(jnp.asarray(xs))
    want = alpha / 2 / (1 + (math.pi / 2 * alpha * xs) ** 2)
    np.testing.assert_allclose(np.asarray(g), want, atol=1e-6)


def test_lif_soft_reset_dynamics():
    """v' = v + (x-v)/tau; spike when v' >= 1; soft reset subtracts threshold."""
    v = jnp.zeros(())
    # constant drive 3.0, tau=2: v: 1.5 (spike, ->0.5), then (0.5+1.25)=1.75...
    spike, v = lif_step(v, jnp.asarray(3.0), tau=2.0)
    assert float(spike) == 1.0 and float(v) == pytest.approx(0.5)
    spike, v = lif_step(v, jnp.asarray(3.0), tau=2.0)
    assert float(spike) == 1.0 and float(v) == pytest.approx(0.75)


def test_lif_hard_reset():
    spike, v = lif_step(jnp.zeros(()), jnp.asarray(3.0), tau=2.0, v_reset=0.0)
    assert float(spike) == 1.0 and float(v) == 0.0  # hard reset to 0


def test_if_step():
    spike, v = if_step(jnp.asarray(0.6), jnp.asarray(0.3))
    assert float(spike) == 0.0 and float(v) == pytest.approx(0.9)
    spike, v = if_step(v, jnp.asarray(0.3))
    assert float(spike) == 1.0 and float(v) == pytest.approx(0.2)  # soft reset


def test_mp_nodes_never_fire():
    v = mp_lif_step(jnp.asarray(0.0), jnp.asarray(100.0), tau=2.0)
    assert float(v) == pytest.approx(50.0)  # pure integrator, no reset
    v2 = mp_ada_lif_step(jnp.asarray(0.0), jnp.asarray(10.0), jnp.asarray(0.0))
    assert float(v2) == pytest.approx(5.0)  # sigmoid(0) = 0.5 leak


# ----------------------- torch EVSNN replica (spec-built) -------------------


class TLIF:
    """Functional torch LIF with soft reset + heaviside fire (eval mode)."""

    def __init__(self):
        self.v = 0.0

    def __call__(self, x):
        self.v = self.v + (x - self.v) / 2.0
        spike = (self.v >= 1.0).float()
        self.v = self.v - spike * 1.0
        return spike


class TEVSNN(nn.Module):
    """Key-layout-compatible torch EVSNN_LIF_final (eval semantics)."""

    def __init__(self):
        super().__init__()
        conv = lambda ci, co, k, s: nn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.static_conv = nn.Sequential(conv(1, 32, 5, 1), nn.BatchNorm2d(32))
        for i, (ci, co) in enumerate([(32, 64), (64, 128), (128, 256)], 1):
            inner = nn.Module()
            inner.conv2d = conv(ci, co, 5, 2)
            inner.norm_layer = nn.BatchNorm2d(co)
            wrap = nn.Module()
            wrap.conv = inner
            setattr(self, f"down{i}", wrap)
        rb = nn.Module()
        rb.conv1 = conv(256, 256, 3, 1)
        rb.bn1 = nn.BatchNorm2d(256)
        rb.conv2 = conv(256, 256, 3, 1)
        rb.bn2 = nn.BatchNorm2d(256)
        self.residualBlock = nn.Sequential(rb)
        for i, (ci, co) in enumerate([(512, 128), (256, 64), (128, 32)], 1):
            up = nn.Module()
            up.conv2d = conv(ci, co, 5, 1)
            up.norm_layer = nn.BatchNorm2d(co)
            setattr(self, f"up{i}", up)
        tf = nn.Module()
        tf.conv2d = nn.Conv2d(64, 1, 1, bias=False)
        tf.norm_layer = nn.BatchNorm2d(1)
        self.temporalflat = tf

    def forward(self, x, lifs, mp):
        up2x = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=False)
        x_in = lifs["static_conv"](self.static_conv(x))
        x1 = lifs["down1"](self.down1.conv.norm_layer(self.down1.conv.conv2d(x_in)))
        x2 = lifs["down2"](self.down2.conv.norm_layer(self.down2.conv.conv2d(x1)))
        x3 = lifs["down3"](self.down3.conv.norm_layer(self.down3.conv.conv2d(x2)))
        rb = self.residualBlock[0]
        s1 = lifs["resblock"](rb.bn1(rb.conv1(x3)))
        r1 = lifs["resblock"](rb.bn2(rb.conv2(s1)) + x3)
        u1 = lifs["up1"](self.up1.norm_layer(self.up1.conv2d(up2x(torch.cat([r1, x3], 1)))))
        u2 = lifs["up2"](self.up2.norm_layer(self.up2.conv2d(up2x(torch.cat([u1, x2], 1)))))
        u3 = lifs["up3"](self.up3.norm_layer(self.up3.conv2d(up2x(torch.cat([u2, x1], 1)))))
        out = self.temporalflat.norm_layer(
            self.temporalflat.conv2d(torch.cat([u3, x_in], 1))
        )
        mp = mp + (out - mp) / 2.0
        return mp


def test_evsnn_checkpoint_parity(rng, tmp_path):
    torch.manual_seed(0)
    tnet = TEVSNN().eval()
    # randomize BN running stats so the stats mapping is actually exercised
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.7, 1.5)
    path = str(tmp_path / "EVSNN.pth")
    torch.save(tnet.state_dict(), path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.name == "EVSNN"

    H, W = 32, 40
    voxel = rng.normal(size=(1, H, W, 5)).astype(np.float32)

    # JAX path (includes the internal LegacyNorm + 5-bin fold)
    state = spec.module.initial_state(1, H, W)
    out, state = spec.module.apply(spec.params, jnp.asarray(voxel), state)
    out2, _ = spec.module.apply(spec.params, jnp.asarray(voxel), state)

    # torch path: replicate RecSNN exactly (rec_snn_forward.py:34 — torch
    # DEFAULT tensor.std(), the unbiased n-1 estimator, NOT the dataset
    # LegacyNorm's population std), bins, persistent LIF membranes
    t = torch.from_numpy(voxel.transpose(0, 3, 1, 2))
    nz = t != 0
    mean, std = t[nz].mean(), t[nz].std()
    t = torch.where(nz, (t - mean) / std, t)
    lifs = {k: TLIF() for k in
            ("static_conv", "down1", "down2", "down3", "resblock", "up1", "up2", "up3")}
    mp = torch.zeros(1, 1, H, W)
    with torch.no_grad():
        for rep in range(2):
            for j in range(5):
                mp = tnet(t[:, j : j + 1], lifs, mp)
            want = mp[0, 0].numpy()
            got = np.asarray((out if rep == 0 else out2)["image"])[0, :, :, 0]
            np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("name", ["EVSNN", "PAEVSNN"])
def test_snn_smoke(name, rng):
    m = build_model(name, {})
    st = m.initial_state(1, 32, 40)
    v = jnp.asarray(rng.normal(size=(1, 32, 40, 5)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), v, st)
    out, st2 = m.apply(params, v, st)
    assert out["image"].shape == (1, 32, 40, 1)
    assert np.isfinite(np.asarray(out["image"])).all()


# --------------------- torch PAEVSNN replica (spec-built) --------------------


class TAdaMP:
    """Functional Mp_AdaLIFNode: v += (x - v) * sigmoid(theta), never fires
    (spiking_neuron.py:371-393, v_reset=None branch)."""

    @staticmethod
    def step(v, x, theta):
        return v + (x - v) * torch.sigmoid(theta)[:, :, None, None]


class TGetTheta(nn.Module):
    """get_theta_simmp 'global'+'mix' (snn_network.py:118-151): fc3 over
    cat[maxpool(out), avgpool(x)] -> relu -> fc2 -> scalar. fc1 is defined
    but DEAD in mix mode (real checkpoints carry it)."""

    def __init__(self, c_in, c_out):
        super().__init__()
        self.fc1 = nn.Linear(c_in, c_in // 4)  # dead in 'mix'
        self.fc2 = nn.Linear(c_out // 4, 1)
        self.fc3 = nn.Linear(c_in + c_out, c_out // 4)

    def forward(self, x, out):
        t1 = F.adaptive_max_pool2d(out, 1).flatten(1)
        t2 = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc2(F.relu(self.fc3(torch.cat([t1, t2], 1))))


class TAdaSkip(nn.Module):
    """Spike_skip_layer -> ConvLayer_ada_simmp (snn_network.py:73-116),
    incl. the dead conv2d_pool/fc1/fc2 that sit in real checkpoints."""

    def __init__(self, c_in, c_out=32, k=1):
        super().__init__()
        conv = nn.Module()
        conv.conv2d = nn.Conv2d(c_in, c_out, k, 1, k // 2, bias=False)
        conv.norm_layer = nn.BatchNorm2d(c_out)
        conv.conv2d_pool = nn.Conv2d(c_out, 1, k, 1, k // 2, bias=False)  # dead
        conv.fc1 = nn.Linear(c_in, c_in // 4)  # dead
        conv.fc2 = nn.Linear(c_in // 4, 4)  # dead
        conv.get_theta = TGetTheta(c_in, c_out)
        self.conv = conv

    def forward(self, x, last_mem):
        out = self.conv.norm_layer(self.conv.conv2d(x))
        theta = self.conv.get_theta(x, out)
        return TAdaMP.step(last_mem, out, theta)


class TPAEVSNN(nn.Module):
    """Key-layout-compatible torch PAEVSNN_LIF_AMPLIF_final (eval
    semantics, snn_network.py:257-356)."""

    def __init__(self):
        super().__init__()
        conv = lambda ci, co, k, s: nn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.static_conv = nn.Sequential(conv(1, 32, 5, 1), nn.BatchNorm2d(32))
        for i, (ci, co) in enumerate([(32, 64), (64, 128), (128, 256)], 1):
            inner = nn.Module()
            inner.conv2d = conv(ci, co, 5, 2)
            inner.norm_layer = nn.BatchNorm2d(co)
            wrap = nn.Module()
            wrap.conv = inner
            setattr(self, f"down{i}", wrap)
        for name, ci in [("skip0", 32), ("skip1", 64), ("skip2", 128),
                         ("skip3", 256), ("up1mp", 256), ("up2mp", 128),
                         ("up3mp", 64)]:
            setattr(self, name, TAdaSkip(ci))
        for i in (1, 2, 3):
            agg = nn.Module()
            agg.conv2d = conv(32, 32, 5, 1)
            agg.norm_layer = nn.BatchNorm2d(32)
            setattr(self, f"aggregation{i}", agg)
        rb = nn.Module()
        rb.conv1 = conv(256, 256, 3, 1)
        rb.bn1 = nn.BatchNorm2d(256)
        rb.conv2 = conv(256, 256, 3, 1)
        rb.bn2 = nn.BatchNorm2d(256)
        self.residualBlock = nn.Sequential(rb)
        for i, (ci, co) in enumerate([(512, 128), (256, 64), (128, 32)], 1):
            up = nn.Module()
            up.conv2d = conv(ci, co, 5, 1)
            up.norm_layer = nn.BatchNorm2d(co)
            setattr(self, f"up{i}", up)
        tf = nn.Module()
        tf.conv2d = nn.Conv2d(64, 32, 1, bias=False)
        tf.norm_layer = nn.BatchNorm2d(32)
        tf.conv2d_pool = nn.Conv2d(32, 1, 1, bias=False)  # dead
        tf.get_theta = TGetTheta(64, 32)
        self.temporalflat = tf
        self.final = nn.Sequential(nn.Conv2d(32, 1, 1, bias=False))

    def forward(self, x, lifs, mp):
        up2x = lambda t: F.interpolate(t, scale_factor=2, mode="bilinear",
                                       align_corners=False)
        x_in = lifs["static_conv"](self.static_conv(x))
        x1 = lifs["down1"](self.down1.conv.norm_layer(self.down1.conv.conv2d(x_in)))
        x2 = lifs["down2"](self.down2.conv.norm_layer(self.down2.conv.conv2d(x1)))
        x3 = lifs["down3"](self.down3.conv.norm_layer(self.down3.conv.conv2d(x2)))
        s0 = self.skip0(x_in, mp[0])
        s1 = self.skip1(x1, mp[1])
        s2 = self.skip2(x2, mp[2])
        s3 = self.skip3(x3, mp[3])
        rb = self.residualBlock[0]
        sp = lifs["resblock"](rb.bn1(rb.conv1(x3)))
        r1 = lifs["resblock"](rb.bn2(rb.conv2(sp)) + x3)
        u1 = lifs["up1"](self.up1.norm_layer(self.up1.conv2d(up2x(torch.cat([r1, x3], 1)))))
        u2 = lifs["up2"](self.up2.norm_layer(self.up2.conv2d(up2x(torch.cat([u1, x2], 1)))))
        u3 = lifs["up3"](self.up3.norm_layer(self.up3.conv2d(up2x(torch.cat([u2, x1], 1)))))
        up1mp = self.up1mp(r1, mp[4])
        up2mp = self.up2mp(u1, mp[5])
        up3mp = self.up3mp(u2, mp[6])
        agg = lambda m, t: m.norm_layer(m.conv2d(up2x(t)))
        a1 = agg(self.aggregation1, s3 + up1mp)
        a2 = agg(self.aggregation2, a1 + (s2 + up2mp))
        a3 = agg(self.aggregation3, a2 + (s1 + up3mp))
        mem = self.temporalflat.norm_layer(
            self.temporalflat.conv2d(torch.cat([u3, x_in], 1))
        )
        theta = self.temporalflat.get_theta(torch.cat([u3, x_in], 1), mem)
        mem = TAdaMP.step(mp[7], mem, theta)
        img = self.final(mem + a3 + s0)
        new_mp = (s0, s1, s2, s3, up1mp, up2mp, up3mp, mem)
        return img, new_mp


def test_paevsnn_checkpoint_parity(rng, tmp_path):
    """Full PAEVSNN conversion + forward parity vs the torch replica: 8
    adaptive-membrane paths, the shared twice-fired resblock LIF, and the
    dead pooled-MLP checkpoint params (which must be dropped by the
    PRECISE unused_ok patterns without masking the live get_theta heads)."""
    torch.manual_seed(1)
    tnet = TPAEVSNN().eval()
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.7, 1.5)
    path = str(tmp_path / "PAEVSNN.pth")
    torch.save(tnet.state_dict(), path)

    from bde2vid_tpu.eval.checkpoint import load_model_from_torch

    spec = load_model_from_torch(path)
    assert spec.name == "PAEVSNN"

    H, W = 32, 40
    voxel = rng.normal(size=(1, H, W, 5)).astype(np.float32)
    state = spec.module.initial_state(1, H, W)
    out, state = spec.module.apply(spec.params, jnp.asarray(voxel), state)
    out2, _ = spec.module.apply(spec.params, jnp.asarray(voxel), state)

    t = torch.from_numpy(voxel.transpose(0, 3, 1, 2))
    nz = t != 0
    mean, std = t[nz].mean(), t[nz].std()  # reference runner: unbiased std
    t = torch.where(nz, (t - mean) / std, t)
    lifs = {k: TLIF() for k in
            ("static_conv", "down1", "down2", "down3", "resblock",
             "up1", "up2", "up3")}
    mp = [torch.zeros(1, 32, H, W), torch.zeros(1, 32, H // 2, W // 2),
          torch.zeros(1, 32, H // 4, W // 4), torch.zeros(1, 32, H // 8, W // 8),
          torch.zeros(1, 32, H // 8, W // 8), torch.zeros(1, 32, H // 4, W // 4),
          torch.zeros(1, 32, H // 2, W // 2), torch.zeros(1, 32, H, W)]
    with torch.no_grad():
        for rep in range(2):
            for j in range(5):
                img, mp = tnet(t[:, j : j + 1], lifs, mp)
            want = img[0, 0].numpy()
            got = np.asarray((out if rep == 0 else out2)["image"])[0, :, :, 0]
            np.testing.assert_allclose(got, want, atol=2e-4)
