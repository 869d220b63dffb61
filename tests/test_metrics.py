"""Metrics tests: SSIM vs independent NumPy oracle, MSE vs torch,
LPIPS vs a torch re-implementation with shared weights."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from bde2vid_tpu.metrics import (
    LPIPS,
    load_lpips_params,
    lpips_distance,
    mse,
    structural_similarity,
)


# --------------------------- SSIM oracle (NumPy) ---------------------------
def _uniform_valid_np(x, win):
    c = np.cumsum(np.cumsum(np.pad(x, ((1, 0), (1, 0))), axis=0), axis=1)
    out = (
        c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win]
    ) / (win * win)
    return out


def ssim_np(a, b, data_range=2.0, win=7):
    """skimage structural_similarity algorithm, independent implementation."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    npx = win * win
    cov_norm = npx / (npx - 1)
    ux = _uniform_valid_np(a, win)
    uy = _uniform_valid_np(b, win)
    uxx = _uniform_valid_np(a * a, win)
    uyy = _uniform_valid_np(b * b, win)
    uxy = _uniform_valid_np(a * b, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_mse_matches_torch(rng):
    a = rng.uniform(0, 1, (2, 16, 24, 1)).astype(np.float32)
    b = rng.uniform(0, 1, (2, 16, 24, 1)).astype(np.float32)
    got = float(mse(jnp.asarray(a), jnp.asarray(b)))
    want = float(F.mse_loss(torch.from_numpy(a), torch.from_numpy(b)))
    assert got == pytest.approx(want, abs=1e-7)


def test_ssim_identical_is_one(rng):
    a = rng.uniform(0, 1, (1, 32, 48, 1)).astype(np.float32)
    assert float(structural_similarity(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(
        1.0, abs=1e-6
    )


def test_ssim_matches_oracle(rng):
    a = rng.uniform(0, 1, (3, 32, 48, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(structural_similarity(jnp.asarray(a), jnp.asarray(b)))
    want = np.mean([ssim_np(a[i, :, :, 0], b[i, :, :, 0]) for i in range(3)])
    assert got == pytest.approx(want, abs=1e-5)


def test_ssim_monotone_with_noise(rng):
    a = rng.uniform(0, 1, (1, 32, 48, 1)).astype(np.float32)
    prev = 1.0
    for sigma in (0.05, 0.15, 0.4):
        b = np.clip(a + rng.normal(0, sigma, a.shape), 0, 1).astype(np.float32)
        s = float(structural_similarity(jnp.asarray(a), jnp.asarray(b)))
        assert s < prev
        prev = s


# ------------------------------- LPIPS -------------------------------------
def _torch_alex_features():
    """torchvision-AlexNet-features trunk built from torch primitives."""
    return torch.nn.ModuleList(
        [
            torch.nn.Conv2d(3, 64, 11, stride=4, padding=2),
            torch.nn.Conv2d(64, 192, 5, padding=2),
            torch.nn.Conv2d(192, 384, 3, padding=1),
            torch.nn.Conv2d(384, 256, 3, padding=1),
            torch.nn.Conv2d(256, 256, 3, padding=1),
        ]
    )


def _torch_alex_forward(convs, x):
    outs = []
    h = torch.relu(convs[0](x))
    outs.append(h)
    h = F.max_pool2d(h, 3, 2)
    h = torch.relu(convs[1](h))
    outs.append(h)
    h = F.max_pool2d(h, 3, 2)
    h = torch.relu(convs[2](h))
    outs.append(h)
    h = torch.relu(convs[3](h))
    outs.append(h)
    h = torch.relu(convs[4](h))
    outs.append(h)
    return outs


def _torch_lpips(convs, lins, in0, in1):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    f0 = _torch_alex_forward(convs, (in0 - shift) / scale)
    f1 = _torch_alex_forward(convs, (in1 - shift) / scale)
    val = 0.0
    for k, (a, b) in enumerate(zip(f0, f1)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = lins[k].view(1, -1, 1, 1)
        val = val + (d * w).sum(1).mean(dim=(1, 2))
    return val


def test_lpips_matches_torch_with_shared_weights(rng):
    convs = _torch_alex_features()
    lins = [torch.rand(c) for c in (64, 192, 384, 256, 256)]
    lin_state = {
        f"lin{k}.model.1.weight": lins[k].numpy().reshape(1, -1, 1, 1) for k in range(5)
    }
    backbone_state = {}
    for j, i in enumerate([0, 3, 6, 8, 10]):
        backbone_state[f"features.{i}.weight"] = convs[j].weight.detach().numpy()
        backbone_state[f"features.{i}.bias"] = convs[j].bias.detach().numpy()

    params = load_lpips_params(lin_state, backbone_state, net="alex")
    module = LPIPS(net="alex")

    in0 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    in1 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(module.apply(params, jnp.asarray(in0), jnp.asarray(in1)))
    want = (
        _torch_lpips(
            convs,
            lins,
            torch.from_numpy(in0.transpose(0, 3, 1, 2)),
            torch.from_numpy(in1.transpose(0, 3, 1, 2)),
        )
        .detach()
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_lpips_distance_gray_replication(rng):
    module = LPIPS(net="alex")
    lin_state = {
        f"lin{k}.model.1.weight": np.ones((1, c, 1, 1), np.float32)
        for k, c in enumerate((64, 192, 384, 256, 256))
    }
    params = load_lpips_params(lin_state, None, net="alex")
    a = rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
    d_same = float(lpips_distance(module, params, jnp.asarray(a), jnp.asarray(a)))
    assert d_same == pytest.approx(0.0, abs=1e-6)
    b = rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
    d_diff = float(lpips_distance(module, params, jnp.asarray(a), jnp.asarray(b)))
    assert d_diff > 0.0


def test_fake_net_metrics(rng):
    from bde2vid_tpu.metrics.lpips import dssim_distance, l2_distance

    a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    l2 = np.asarray(l2_distance(a, b))
    assert l2.shape == (2,) and (l2 > 0).all()
    np.testing.assert_allclose(np.asarray(l2_distance(a, a)), 0, atol=1e-7)
    ds = np.asarray(dssim_distance(a, b))
    assert ds.shape == (2,) and (ds >= 0).all() and (ds <= 1).all()
    np.testing.assert_allclose(np.asarray(dssim_distance(a, a)), 0, atol=1e-6)


# --- perceptual-study scorers (reference dist_model.py:254-330) -----------


def test_voc_ap_perfect_and_07():
    from bde2vid_tpu.metrics import voc_ap

    rec = np.array([0.25, 0.5, 0.75, 1.0])
    prec = np.ones(4)
    assert voc_ap(rec, prec) == pytest.approx(1.0)
    # 11-point metric on the same perfect curve is also 1.0
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)
    # half-precision everywhere halves the area
    assert voc_ap(rec, 0.5 * prec) == pytest.approx(0.5)


def test_score_2afc_agreement_and_ties():
    from bde2vid_tpu.metrics import score_2afc

    d0s = np.array([0.1, 0.9, 0.5])
    d1s = np.array([0.9, 0.1, 0.5])
    gts = np.array([0.0, 1.0, 1.0])  # humans prefer p0, p1, p1
    score, detail = score_2afc(d0s, d1s, gts)
    # item0: d0<d1 and gt=0 -> 1; item1: d1<d0 and gt=1 -> 1; item2 tie -> 0.5
    assert score == pytest.approx((1.0 + 1.0 + 0.5) / 3)
    np.testing.assert_allclose(detail["scores"], [1.0, 1.0, 0.5])


def test_score_jnd_perfect_separation():
    from bde2vid_tpu.metrics import score_jnd

    # identical pairs (same=1) all at small distance, different at large
    ds = np.array([0.1, 0.2, 0.9, 1.0])
    sames = np.array([1.0, 1.0, 0.0, 0.0])
    score, _ = score_jnd(ds, sames)
    assert score == pytest.approx(1.0)
    # inverted distances -> poor AP
    bad, _ = score_jnd(ds[::-1].copy(), sames)
    assert bad < 0.75


def test_scorer_dataset_wrappers():
    from bde2vid_tpu.metrics import score_2afc_dataset, score_jnd_dataset

    def l2(a, b):
        return ((np.asarray(a) - np.asarray(b)) ** 2).mean(axis=(1, 2, 3))

    rng = np.random.default_rng(0)
    ref = rng.normal(size=(4, 8, 8, 3))
    near = ref + 0.01 * rng.normal(size=ref.shape)
    far = ref + 1.0 * rng.normal(size=ref.shape)
    batches = [dict(ref=ref, p0=near, p1=far, judge=np.zeros(4))]
    score, _ = score_2afc_dataset(batches, l2)
    assert score == pytest.approx(1.0)  # humans+metric both prefer the near patch

    jnd_batches = [dict(p0=ref, p1=near, same=np.ones(4)),
                   dict(p0=ref, p1=far, same=np.zeros(4))]
    jscore, _ = score_jnd_dataset(jnd_batches, l2)
    assert jscore == pytest.approx(1.0)


# -------------------------- squeeze backbone LPIPS ---------------------------


class _TFire(torch.nn.Module):
    def __init__(self, cin, s, e):
        super().__init__()
        self.squeeze = torch.nn.Conv2d(cin, s, 1)
        self.expand1x1 = torch.nn.Conv2d(s, e, 1)
        self.expand3x3 = torch.nn.Conv2d(s, e, 3, padding=1)

    def forward(self, x):
        s = torch.relu(self.squeeze(x))
        return torch.cat(
            [torch.relu(self.expand1x1(s)), torch.relu(self.expand3x3(s))], 1
        )


def _torch_squeeze_features():
    """torchvision squeezenet1_1 features layout (same Sequential indices,
    so state-dict keys match: features.0, features.{3,4,6,7,9,10,11,12}.*)."""
    return torch.nn.Sequential(
        torch.nn.Conv2d(3, 64, 3, stride=2),
        torch.nn.ReLU(inplace=False),
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(64, 16, 64),
        _TFire(128, 16, 64),
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(128, 32, 128),
        _TFire(256, 32, 128),
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(256, 48, 192),
        _TFire(384, 48, 192),
        _TFire(384, 64, 256),
        _TFire(512, 64, 256),
    )


def _torch_squeeze_forward(feats, x):
    outs = []
    taps = {1, 4, 7, 9, 10, 11, 12}
    h = x
    for i, layer in enumerate(feats):
        h = layer(h)
        if i in taps:
            outs.append(h)
    return outs


def test_lpips_squeeze_matches_torch_with_real_lin_weights(rng):
    """7-slice SqueezeNet LPIPS vs a torch replica with shared random
    backbone weights and the REAL vendored squeeze.pth lin heads."""
    import os

    from bde2vid_tpu.metrics.lpips import SQUEEZE_CHNS

    vendored = "/root/reference/LPIPS/weights/v0.1/squeeze.pth"
    if not os.path.isfile(vendored):
        pytest.skip("vendored squeeze lin weights not present")

    feats = _torch_squeeze_features().eval()
    backbone_state = {
        f"features.{k}": v.detach().numpy() for k, v in feats.state_dict().items()
    }
    lin_state = {k: v.numpy() for k, v in torch.load(vendored, map_location="cpu").items()}
    lins = [torch.from_numpy(lin_state[f"lin{k}.model.1.weight"]).reshape(-1)
            for k in range(7)]
    assert [len(l) for l in lins] == SQUEEZE_CHNS

    params = load_lpips_params(lin_state, backbone_state, net="squeeze")
    module = LPIPS(net="squeeze")

    in0 = rng.uniform(-1, 1, (2, 65, 67, 3)).astype(np.float32)  # odd: ceil pool
    in1 = rng.uniform(-1, 1, (2, 65, 67, 3)).astype(np.float32)
    got = np.asarray(module.apply(params, jnp.asarray(in0), jnp.asarray(in1)))

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    t = lambda x: torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        f0 = _torch_squeeze_forward(feats, (t(in0) - shift) / scale)
        f1 = _torch_squeeze_forward(feats, (t(in1) - shift) / scale)
        want = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            want = want + (((na - nb) ** 2) * lins[k].view(1, -1, 1, 1)).sum(1).mean(dim=(1, 2))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5, rtol=1e-4)


def test_pnet_unweighted_matches_torch(rng):
    """PNet (no lin heads, equal channel weighting) vs torch cosine math
    (reference networks_basic.py:18-69 + util.cos_sim)."""
    from bde2vid_tpu.metrics.lpips import PNet

    convs = _torch_alex_features()
    backbone_state = {}
    for j, i in enumerate([0, 3, 6, 8, 10]):
        backbone_state[f"features.{i}.weight"] = convs[j].weight.detach().numpy()
        backbone_state[f"features.{i}.bias"] = convs[j].bias.detach().numpy()
    lpips_params = load_lpips_params({}, backbone_state, net="alex")
    pnet_params = {"params": {"backbone": lpips_params["params"]["backbone"]}}

    module = PNet(net="alex")
    in0 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    in1 = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(module.apply(pnet_params, jnp.asarray(in0), jnp.asarray(in1)))

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    t = lambda x: torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        f0 = _torch_alex_forward(convs, (t(in0) - shift) / scale)
        f1 = _torch_alex_forward(convs, (t(in1) - shift) / scale)
        want = 0.0
        for a, b in zip(f0, f1):
            na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            want = want + (1.0 - (na * nb).sum(1)).mean(dim=(1, 2))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5, rtol=1e-4)


def test_2afc_metric_training(rng):
    """Rank-net + lin-head training (reference dist_model 'lin' mode):
    BCE ranking loss decreases on consistent synthetic judgements, lin
    weights stay clamped >= 0, and 2AFC accuracy reaches 1.0 on the
    separable task."""
    import optax

    from bde2vid_tpu.metrics.lpips import (
        Dist2Logit,
        compute_2afc_accuracy,
        lpips_distance,
        make_2afc_train_step,
    )

    module = LPIPS(net="alex")
    dummy = jnp.zeros((1, 32, 32, 3))
    lpips_params = module.init(jax.random.PRNGKey(0), dummy, dummy)

    rank_net = Dist2Logit()
    rank_params = rank_net.init(
        jax.random.PRNGKey(1), jnp.zeros((4,)), jnp.zeros((4,))
    )

    n = 8
    ref = rng.uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)
    p0 = np.clip(ref + 0.05 * rng.normal(size=ref.shape), -1, 1).astype(np.float32)
    p1 = np.clip(ref + 0.6 * rng.normal(size=ref.shape), -1, 1).astype(np.float32)
    judge = np.zeros((n,), np.float32)  # humans prefer p0 (less distorted)
    ref, p0, p1 = jnp.asarray(ref), jnp.asarray(p0), jnp.asarray(p1)

    tx = optax.adam(1e-3)
    # optimizer state over (lin_tree, rank_params), matching the step's split
    lin_tree = {k: v for k, v in lpips_params["params"].items() if k.startswith("lin")}
    opt_state = tx.init((lin_tree, rank_params))
    step = make_2afc_train_step(module, rank_net, tx)

    losses = []
    for _ in range(30):
        lpips_params, rank_params, opt_state, loss = step(
            lpips_params, rank_params, opt_state, ref, p0, p1, jnp.asarray(judge)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
    for k, v in lpips_params["params"].items():
        if k.startswith("lin"):
            assert float(jnp.min(v)) >= 0.0, k

    d0 = np.asarray([float(lpips_distance(module, lpips_params, ref[i:i+1], p0[i:i+1],
                                          normalize=False)) for i in range(n)])
    d1 = np.asarray([float(lpips_distance(module, lpips_params, ref[i:i+1], p1[i:i+1],
                                          normalize=False)) for i in range(n)])
    assert compute_2afc_accuracy(d0, d1, judge) == 1.0


def test_psnr_matches_reference_formula(rng):
    from bde2vid_tpu.metrics.basic import psnr

    a = rng.uniform(0, 1, (16, 20)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 20)).astype(np.float32)
    got = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    want = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    assert got == pytest.approx(want, rel=1e-5)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))) > 100  # identical -> huge


def test_metric_batch_psnr(rng):
    from bde2vid_tpu.eval.driver import _metric_batch

    preds = jnp.asarray(rng.uniform(0, 1, (3, 16, 20)).astype(np.float32))
    gts = jnp.asarray(rng.uniform(0, 1, (3, 16, 20)).astype(np.float32))
    out = _metric_batch(preds, gts, ("mse", "psnr"), None)
    assert out["psnr"].shape == (3,)
    np.testing.assert_allclose(
        out["psnr"], 10 * np.log10(1.0 / out["mse"]), rtol=1e-4
    )


def test_dssim_matches_reference_rgb_chain(rng):
    """FakeNet DSSIM (RGB path, networks_basic.py:247-253): inputs [-1,1]
    map through tensor2im's truncating uint8 cast, then
    (1 - SSIM(data_range=255)) / 2 — NOT SSIM on the raw floats (the
    luminance term is not shift-invariant)."""
    from bde2vid_tpu.metrics.lpips import dssim_distance

    a = rng.uniform(-1, 1, (32, 32)).astype(np.float32)
    b = (a + rng.normal(0, 0.1, a.shape)).clip(-1, 1).astype(np.float32)
    # reference chain in NumPy: tensor2im -> util.dssim
    ia = ((a + 1.0) * 127.5).astype(np.uint8).astype(np.float64)
    ib = ((b + 1.0) * 127.5).astype(np.uint8).astype(np.float64)
    want = (1.0 - ssim_np(ia, ib, data_range=255.0)) / 2.0
    got = float(
        dssim_distance(jnp.asarray(a[None, ..., None]), jnp.asarray(b[None, ..., None]))[0]
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lpips_features_runs_and_normalizes(rng):
    """lpips_features must apply the backbone standalone (full LPIPS param
    tree or bare backbone tree) and return unit-normalized feature maps."""
    from bde2vid_tpu.metrics.lpips import lpips_features

    module = LPIPS(net="alex")
    d = jnp.zeros((1, 64, 64, 3))
    params = module.init(jax.random.PRNGKey(0), d, d)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    feats = lpips_features(module, params, x)
    assert len(feats) == 5
    for f in feats:
        norms = np.asarray(jnp.sqrt(jnp.sum(f**2, axis=-1)))
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # bare backbone tree also accepted
    feats2 = lpips_features(module, {"params": params["params"]["backbone"]}, x)
    np.testing.assert_allclose(np.asarray(feats[0]), np.asarray(feats2[0]), atol=1e-6)


def test_load_lpips_params_strict_on_missing_lin(rng):
    from bde2vid_tpu.metrics import load_lpips_params

    with pytest.raises(KeyError, match="lin0"):
        load_lpips_params({"bogus": np.ones((1, 64, 1, 1))}, net="alex")
    # pip-lpips layout accepted
    chns = [64, 192, 384, 256, 256]
    lin = {f"lin{k}.weight": np.full((1, c, 1, 1), 0.5, np.float32) for k, c in enumerate(chns)}
    params = load_lpips_params(lin, net="alex")
    np.testing.assert_allclose(np.asarray(params["params"]["lin0"]), 0.5)


# ----------------------------- lpips_util helpers -----------------------------


def test_tensor2im_roundtrip(rng):
    from bde2vid_tpu.metrics import im2tensor, tensor2im

    img = rng.integers(0, 256, (12, 10, 3)).astype(np.uint8)
    t = im2tensor(img)
    assert t.shape == (1, 12, 10, 3)
    assert t.min() >= -1.0 and t.max() <= 1.0
    back = tensor2im(t)
    # float32 division then truncating cast (the reference's own math) can
    # land one code value low; exact for most pixels, off-by-one at worst
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_rgb2lab_known_values_and_roundtrip(rng):
    from bde2vid_tpu.metrics import lab2rgb, rgb2lab

    # white -> L=100, a~0, b~0; black -> 0,0,0 (CIE definition)
    lab_w = rgb2lab(np.ones((1, 1, 3)))
    np.testing.assert_allclose(lab_w[0, 0], [100.0, 0.0, 0.0], atol=0.02)
    lab_k = rgb2lab(np.zeros((1, 1, 3)))
    np.testing.assert_allclose(lab_k[0, 0], [0.0, 0.0, 0.0], atol=0.02)
    # mid gray is achromatic
    lab_g = rgb2lab(np.full((1, 1, 3), 0.5))
    np.testing.assert_allclose(lab_g[0, 0, 1:], [0.0, 0.0], atol=0.02)
    rgb = rng.uniform(0, 1, (8, 9, 3))
    np.testing.assert_allclose(lab2rgb(rgb2lab(rgb)), rgb, atol=1e-6)


def test_rgb2lab_matches_skimage_if_available(rng):
    skimage_color = pytest.importorskip("skimage.color")
    from bde2vid_tpu.metrics import rgb2lab

    rgb = rng.uniform(0, 1, (6, 7, 3))
    np.testing.assert_allclose(
        rgb2lab(rgb), skimage_color.rgb2lab(rgb), atol=1e-4
    )


def test_montage_grid(rng):
    from bde2vid_tpu.metrics import montage

    # 6 images (Y=4, X=3, C=2): explicit 2x3 grid, pad 1
    imgs = rng.uniform(size=(4, 3, 2, 6)).astype(np.float32)
    out = montage(imgs, pad=1, mm=2, nn=3)
    assert out.shape == (2 * 5 - 1, 3 * 4 - 1, 2)
    # top-to-bottom prime dir: tile i sits at (i % mm, i // mm)
    np.testing.assert_array_equal(out[0:4, 0:3], imgs[:, :, :, 0])
    np.testing.assert_array_equal(out[5:9, 0:3], imgs[:, :, :, 1])
    np.testing.assert_array_equal(out[0:4, 4:7], imgs[:, :, :, 2])
    # 3-dim input comes back 2-dim
    out2 = montage(imgs[:, :, 0, :], pad=1, mm=2, nn=3)
    assert out2.shape == (9, 11)


def test_bootstrap_statistics(rng):
    from bde2vid_tpu.metrics import bootstrap

    vec = rng.normal(loc=3.0, scale=0.5, size=400)
    stats = bootstrap(vec, num_samples=200, rng=rng)
    assert stats.shape == (200,)
    assert abs(stats.mean() - vec.mean()) < 0.1
    assert 0.0 < stats.std() < 0.1  # ~sigma/sqrt(n)


def test_psnr255_and_save_image(tmp_path, rng):
    from bde2vid_tpu.metrics import psnr255
    from bde2vid_tpu.metrics.lpips_util import save_image

    a = rng.integers(0, 256, (16, 16)).astype(np.float64)
    b = np.clip(a + 10.0, 0, 255)
    got = psnr255(a, b)
    want = 10 * np.log10(255.0**2 / np.mean((a - b) ** 2))
    assert got == pytest.approx(want)

    rgbpath = str(tmp_path / "m.png")
    save_image(rng.integers(0, 256, (8, 9, 3)).astype(np.uint8), rgbpath)
    graypath = str(tmp_path / "g.png")
    save_image(rng.integers(0, 256, (8, 9)).astype(np.uint8), graypath)
    for p, color_type in ((rgbpath, 2), (graypath, 0)):
        with open(p, "rb") as fp:
            data = fp.read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # IHDR: width=9 height=8, bit depth 8, expected color type
        import struct

        w, h, depth, ct = struct.unpack(">IIBB", data[16:26])
        assert (w, h, depth, ct) == (9, 8, 8, color_type)
    try:
        import cv2

        img = cv2.imread(rgbpath)
        assert img is not None and img.shape == (8, 9, 3)
    except ImportError:
        pass


def test_tensor2tensorlab_reference_chain(rng):
    """tensor2im quantization FIRST (reference :105), element 0 only; L in
    [0,100] raw, ~[-0.5,0.5] normalized."""
    from bde2vid_tpu.metrics.lpips_util import tensor2tensorlab

    x = rng.uniform(-1, 1, (2, 6, 7, 3)).astype(np.float32)
    raw = tensor2tensorlab(x, to_norm=False)
    assert raw.shape == (1, 6, 7, 3)
    assert raw[..., 0].min() >= 0.0 and raw[..., 0].max() <= 100.0
    norm = tensor2tensorlab(x)
    assert np.abs(norm[..., 0]).max() <= 0.51
    mc = tensor2tensorlab(x, mc_only=True)
    # mc_only centers L but leaves a/b unscaled
    np.testing.assert_allclose(mc[..., 1:], raw[..., 1:], atol=1e-4)
    np.testing.assert_allclose(mc[..., 0], raw[..., 0] - 50.0, atol=1e-4)


def test_lpips_util_debug_helpers(tmp_path, rng, capsys):
    """The debug-helper tail of reference LPIPS/util/util.py:152-256:
    tensor2vec squeeze, diagnose_network mean |grad| over a pytree,
    grab_patch, resize/zoom shapes, prep_display_image clipping,
    print_numpy/info/varname output, mkdirs."""
    from bde2vid_tpu.metrics import lpips_util as lu

    # tensor2vec: (N,1,1,C) -> (N,C)
    v = rng.standard_normal((3, 1, 1, 5)).astype(np.float32)
    np.testing.assert_array_equal(lu.tensor2vec(v), v[:, 0, 0, :])

    # diagnose_network: mean over per-leaf mean |g|, None leaves skipped
    grads = {"a": np.array([1.0, -3.0]), "b": None, "c": np.array([[2.0]])}
    got = lu.diagnose_network(grads, name="net")
    assert np.isclose(got, (2.0 + 2.0) / 2.0)
    out = capsys.readouterr().out
    assert "net" in out

    # grab_patch
    img = rng.standard_normal((8, 9, 3))
    np.testing.assert_array_equal(lu.grab_patch(img, 4, 1, 2), img[1:5, 2:6, :])

    # resize_image: longest side -> max_size; resize_image_zoom identity at 1
    small = rng.uniform(0, 1, (4, 8, 3))
    resized = lu.resize_image(small, max_size=16)
    assert resized.shape[:2] == (8, 16)
    assert lu.resize_image_zoom(small, 1.0) is small
    assert lu.resize_image_zoom(small, 2.0, order=1).shape == (8, 16, 3)

    # prep_display_image
    f = np.array([[-0.5, 0.5, 1.5]])
    np.testing.assert_array_equal(
        lu.prep_display_image(f, dtype="float"), [[0.0, 0.5, 1.0]]
    )
    u = np.array([[-3.0, 128.0, 300.0]])
    np.testing.assert_array_equal(lu.prep_display_image(u), [[0, 128, 255]])

    # print_numpy / info emit readable summaries
    lu.print_numpy(np.arange(4.0), val=True, shp=True)
    lu.info(np.ndarray, spacing=4)
    out = capsys.readouterr().out
    assert "shape," in out and "mean" in out

    # varname resolves the call-site identifier
    some_array = f
    assert lu.varname(some_array) == "some_array"

    # mkdirs handles str and list
    d1 = str(tmp_path / "x" / "y")
    d2 = str(tmp_path / "z")
    lu.mkdirs([d1, d2])
    lu.mkdirs(d1)  # idempotent
    import os

    assert os.path.isdir(d1) and os.path.isdir(d2)


def test_lpips_util_load_image_roundtrip(tmp_path, rng):
    """load_image reads back the PNG save_image wrote, as RGB (reference
    load_image :176-177 returns BGR reversed to RGB)."""
    from bde2vid_tpu.metrics import lpips_util as lu

    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    path = str(tmp_path / "t.png")
    lu.save_image(img, path)
    got = lu.load_image(path)
    np.testing.assert_array_equal(got, img)
