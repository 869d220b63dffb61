"""LPIPS (net-lin) perceptual metric in JAX/flax.

Reference: LPIPS/models/networks_basic.py PNetLin :72-175 (v0.1 scaling:
inputs in [-1,1] are shifted/scaled by per-channel constants, run through a
frozen AlexNet/VGG16 feature extractor, features unit-normalized over
channels, squared diffs passed through learned 1x1 "lin" convs, spatially
averaged and summed over layers) and pretrained_networks.py :63-100 (the
slice boundaries).

Pretrained torchvision backbone weights are not bundled (and cannot be
downloaded in this environment); ``load_lpips_params`` converts a torch
state dict (torchvision ``alexnet``/``vgg16`` ``features.*`` naming + LPIPS
``lin{k}.model.1.weight`` heads) into the flax param tree at runtime.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# v0.1 color normalization constants (networks_basic.py:109-110)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

ALEX_CHNS = [64, 192, 384, 256, 256]
VGG_CHNS = [64, 128, 256, 512, 512]
SQUEEZE_CHNS = [64, 128, 256, 384, 384, 512, 512]


def find_default_lpips_lin(net: str = "alex") -> Optional[str]:
    """Locate the vendored v0.1 lin-head weights without an explicit flag.

    Search order: $BDE2VID_LPIPS_LIN, a repo-local ``weights/lpips/{net}.pth``
    drop-in, then the reference mirror's vendored copy
    (LPIPS/weights/v0.1/{net}.pth — the exact file the reference metric is
    built from, dist_model.py:30-163). Returns None when nothing is found.

    Note: the lin heads alone give the learned per-channel weighting; full
    paper-parity LPIPS additionally needs the torchvision backbone state
    dict supplied via ``--lpips_backbone`` (not redistributable here).
    """
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = os.environ.get("BDE2VID_LPIPS_LIN")
    if env:
        # an EXPLICITLY-set path that doesn't resolve is a user error —
        # silently falling through to other candidates would score with
        # weights the user never chose
        if not os.path.isfile(env):
            raise FileNotFoundError(
                f"BDE2VID_LPIPS_LIN={env} does not exist (unset it to use "
                "the discovered defaults)"
            )
        return env
    candidates = [
        os.path.join(repo_root, "weights", "lpips", f"{net}.pth"),
        f"/root/reference/LPIPS/weights/v0.1/{net}.pth",
    ]
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def _maxpool_3x3_s2(x: Array) -> Array:
    """MaxPool2d(kernel=3, stride=2), VALID — torch default (no padding)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features`` trunk, returning the 5 relu slices
    LPIPS taps (pretrained_networks.py:63-100)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((p, p), (p, p)), dtype=self.dtype, name=name
        )
        outs = []
        h = jax.nn.relu(conv(64, 11, 4, 2, "conv0")(x))
        outs.append(h)  # relu1
        h = _maxpool_3x3_s2(h)
        h = jax.nn.relu(conv(192, 5, 1, 2, "conv1")(h))
        outs.append(h)  # relu2
        h = _maxpool_3x3_s2(h)
        h = jax.nn.relu(conv(384, 3, 1, 1, "conv2")(h))
        outs.append(h)  # relu3
        h = jax.nn.relu(conv(256, 3, 1, 1, "conv3")(h))
        outs.append(h)  # relu4
        h = jax.nn.relu(conv(256, 3, 1, 1, "conv4")(h))
        outs.append(h)  # relu5
        return outs


def _maxpool_3x3_s2_ceil(x: Array) -> Array:
    """MaxPool2d(3, stride=2, ceil_mode=True) — torchvision squeezenet1_1.
    Right/bottom -inf padding reproduces ceil semantics (padded lanes never
    win the max; with stride 2 every kept window overlaps real pixels)."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - 3) // 2) + 1
    out_w = -(-(w - 3) // 2) + 1
    pad_h = max(0, (out_h - 1) * 2 + 3 - h)
    pad_w = max(0, (out_w - 1) * 2 + 3 - w)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


class _Fire(nn.Module):
    """SqueezeNet Fire: 1x1 squeeze -> relu -> parallel 1x1/3x3 expands,
    concatenated (torchvision squeezenet1_1 Fire)."""

    squeeze: int
    expand: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jax.nn.relu(
            nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="squeeze")(x)
        )
        a = jax.nn.relu(
            nn.Conv(self.expand, (1, 1), dtype=self.dtype, name="expand1x1")(s)
        )
        b = jax.nn.relu(
            nn.Conv(
                self.expand, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name="expand3x3",
            )(s)
        )
        return jnp.concatenate([a, b], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """torchvision squeezenet1_1 ``features`` trunk, tapped at the 7 relu
    slices LPIPS uses (pretrained_networks.py:11-60). Module names mirror
    the torch indices (fire3..fire12) so the converter maps keys 1:1."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        fire = lambda i, s, e: _Fire(s, e, dtype=self.dtype, name=f"fire{i}")
        outs = []
        h = jax.nn.relu(
            nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv0")(x)
        )
        outs.append(h)  # slice1: [0, 1]
        h = _maxpool_3x3_s2_ceil(h)
        h = fire(3, 16, 64)(h)
        h = fire(4, 16, 64)(h)
        outs.append(h)  # slice2: [2..4]
        h = _maxpool_3x3_s2_ceil(h)
        h = fire(6, 32, 128)(h)
        h = fire(7, 32, 128)(h)
        outs.append(h)  # slice3: [5..7]
        h = _maxpool_3x3_s2_ceil(h)
        h = fire(9, 48, 192)(h)
        outs.append(h)  # slice4: [8, 9]
        h = fire(10, 48, 192)(h)
        outs.append(h)  # slice5: [10]
        h = fire(11, 64, 256)(h)
        outs.append(h)  # slice6: [11]
        h = fire(12, 64, 256)(h)
        outs.append(h)  # slice7: [12]
        return outs


class VGG16Features(nn.Module):
    """torchvision VGG16 trunk tapped at relu{1_2,2_2,3_3,4_3,5_3}."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        conv = lambda f, i: nn.Conv(
            f, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv{i}"
        )
        pool = lambda h: jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        outs = []
        h = jax.nn.relu(conv(64, 0)(x))
        h = jax.nn.relu(conv(64, 1)(h))
        outs.append(h)
        h = pool(h)
        h = jax.nn.relu(conv(128, 2)(h))
        h = jax.nn.relu(conv(128, 3)(h))
        outs.append(h)
        h = pool(h)
        h = jax.nn.relu(conv(256, 4)(h))
        h = jax.nn.relu(conv(256, 5)(h))
        h = jax.nn.relu(conv(256, 6)(h))
        outs.append(h)
        h = pool(h)
        h = jax.nn.relu(conv(512, 7)(h))
        h = jax.nn.relu(conv(512, 8)(h))
        h = jax.nn.relu(conv(512, 9)(h))
        outs.append(h)
        h = pool(h)
        h = jax.nn.relu(conv(512, 10)(h))
        h = jax.nn.relu(conv(512, 11)(h))
        h = jax.nn.relu(conv(512, 12)(h))
        outs.append(h)
        return outs


def _normalize_tensor(x: Array, eps: float = 1e-10) -> Array:
    """Unit-normalize over the channel axis (LPIPS util.normalize_tensor)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def _make_backbone(net: str, dtype=jnp.float32):
    if net == "alex":
        return AlexNetFeatures(dtype=dtype, name="backbone")
    if net in ("vgg", "vgg16"):
        return VGG16Features(dtype=dtype, name="backbone")
    if net == "squeeze":
        return SqueezeNetFeatures(dtype=dtype, name="backbone")
    raise ValueError(f"unsupported LPIPS net {net!r}")


def _net_chns(net: str):
    return {"alex": ALEX_CHNS, "vgg": VGG_CHNS, "vgg16": VGG_CHNS,
            "squeeze": SQUEEZE_CHNS}[net]


class LPIPS(nn.Module):
    """net-lin LPIPS distance. Inputs NHWC in [-1, 1], 3 channels.

    Returns per-example distance (N,). The 1x1 lin heads have no bias
    (NetLinLayer: dropout + 1x1 conv, networks_basic.py).
    """

    net: str = "alex"
    version: str = "0.1"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in0: Array, in1: Array) -> Array:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        if self.version == "0.1":
            in0 = (in0 - shift) / scale
            in1 = (in1 - shift) / scale
        # v0.0 skips input scaling (original-release bug kept for parity)
        backbone = _make_backbone(self.net, self.dtype)
        chns = _net_chns(self.net)
        f0 = backbone(in0)
        f1 = backbone(in1)
        total = 0.0
        for k, (a, b) in enumerate(zip(f0, f1)):
            d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            w = self.param(f"lin{k}", nn.initializers.ones, (chns[k],), jnp.float32)
            # 1x1 conv with no bias == channel-weighted sum
            layer_val = jnp.sum(d * w.astype(d.dtype), axis=-1)  # (N, H, W)
            total = total + jnp.mean(layer_val, axis=(1, 2))  # (N,)
        return total


def lpips_features(module: LPIPS, params, x: Array) -> List[Array]:
    """Unit-normalized backbone features of x (for VIP-style feature losses).

    ``params`` may be a full LPIPS tree ({'params': {'backbone': ...}}) or a
    bare backbone tree; x is NHWC in the backbone's input scale."""
    cls = {
        "alex": AlexNetFeatures,
        "vgg": VGG16Features,
        "vgg16": VGG16Features,  # _make_backbone/_net_chns accept this alias
        "squeeze": SqueezeNetFeatures,
    }[module.net]
    bb = cls(dtype=module.dtype)  # standalone: top-level module name unset
    p = params.get("params", params)
    sub = {"params": p["backbone"] if "backbone" in p else p}
    return [_normalize_tensor(f) for f in bb.apply(sub, x)]


def lpips_distance(module: LPIPS, params, pred: Array, target: Array, normalize: bool = True) -> Array:
    """Reference perceptual_loss semantics (evaluate/metrics.py:78-97):
    inputs in [0,1] are scaled to [-1,1]; 1-channel inputs are replicated to
    3; returns the mean distance over the batch."""
    if normalize:
        pred = 2.0 * pred - 1.0
        target = 2.0 * target - 1.0
    if pred.shape[-1] == 1:
        pred = jnp.repeat(pred, 3, axis=-1)
        target = jnp.repeat(target, 3, axis=-1)
    # reference calls forward_pair(target, pred) in that order
    return jnp.mean(module.apply(params, target, pred))


class PNet(nn.Module):
    """Unweighted perceptual distance: sum over slices of the spatial-mean
    cosine distance between backbone features (reference PNet,
    networks_basic.py:18-69 — all channels equally weighted, no lin heads).
    Inputs NHWC in [-1, 1]; returns per-example distance (N,)."""

    net: str = "vgg"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in0: Array, in1: Array) -> Array:
        shift = jnp.asarray(_SHIFT, self.dtype)
        scale = jnp.asarray(_SCALE, self.dtype)
        in0 = (in0 - shift) / scale
        in1 = (in1 - shift) / scale
        backbone = _make_backbone(self.net, self.dtype)
        f0 = backbone(in0)
        f1 = backbone(in1)
        val = 0.0
        for a, b in zip(f0, f1):
            cos = jnp.sum(_normalize_tensor(a) * _normalize_tensor(b), axis=-1)
            val = val + jnp.mean(1.0 - cos, axis=(1, 2))  # util.cos_sim :82-89
        return val


# ---------------------------------------------------------------------------
# Torch checkpoint conversion
# ---------------------------------------------------------------------------

_ALEX_FEATURE_IDS = [0, 3, 6, 8, 10]  # torchvision alexnet features.* conv ids
_VGG_FEATURE_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def load_lpips_params(
    lin_state: Dict[str, "np.ndarray"],
    backbone_state: Optional[Dict[str, "np.ndarray"]] = None,
    net: str = "alex",
    rng: Optional[jax.Array] = None,
    image_hw: tuple = (64, 64),
):
    """Build LPIPS flax params from torch state dicts (values as numpy).

    - ``lin_state``: keys ``lin{k}.model.1.weight`` of shape (1, C, 1, 1)
      (the vendored LPIPS/weights/v0.1/{alex,vgg}.pth layout).
    - ``backbone_state``: torchvision ``features.{i}.weight/bias`` keys. If
      None, backbone params stay randomly initialized (architecture tests
      only — NOT metric parity).
    """
    module = LPIPS(net=net)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, *image_hw, 3))
    params = module.init(rng, dummy, dummy)
    params = jax.tree_util.tree_map(np.asarray, params)

    # vendored LPIPS/weights layout first, pip-lpips layout second; STRICT
    # for a non-empty lin_state — silently keeping a ones-initialized head
    # would produce unweighted (wrong) LPIPS values with no error. An empty
    # dict is an explicit "backbone only" request (e.g. PNet conversion).
    if lin_state:
        chns = _net_chns(net)
        for k in range(len(chns)):
            for key in (f"lin{k}.model.1.weight", f"lin{k}.weight"):
                if key in lin_state:
                    arr = np.asarray(lin_state[key]).reshape(-1).astype(np.float32)
                    if arr.shape != (chns[k],):
                        # fail HERE, not as an opaque XLA broadcast error
                        # later: a vgg lin file against net='alex' passes
                        # lin0 (64 == 64) and only diverges at lin1
                        raise ValueError(
                            f"lin{k} weight has {arr.shape[0]} channels, "
                            f"net='{net}' expects {chns[k]} — wrong-net lin "
                            "file?"
                        )
                    params["params"][f"lin{k}"] = arr
                    break
            else:
                raise KeyError(
                    f"lin head 'lin{k}' not found in lin_state (looked for "
                    f"'lin{k}.model.1.weight' and 'lin{k}.weight'; got keys "
                    f"{sorted(lin_state)[:6]}...)"
                )

    if backbone_state is not None:
        to_hwio = lambda w: np.asarray(w).transpose(2, 3, 1, 0).astype(np.float32)
        if net == "squeeze":
            # torchvision squeezenet1_1: features.0 conv + Fire modules at
            # indices 3,4,6,7,9,10,11,12 with squeeze/expand1x1/expand3x3
            params["params"]["backbone"]["conv0"] = {
                "kernel": to_hwio(backbone_state["features.0.weight"]),
                "bias": np.asarray(backbone_state["features.0.bias"], np.float32),
            }
            for i in (3, 4, 6, 7, 9, 10, 11, 12):
                fire = {}
                for sub in ("squeeze", "expand1x1", "expand3x3"):
                    fire[sub] = {
                        "kernel": to_hwio(backbone_state[f"features.{i}.{sub}.weight"]),
                        "bias": np.asarray(
                            backbone_state[f"features.{i}.{sub}.bias"], np.float32
                        ),
                    }
                params["params"]["backbone"][f"fire{i}"] = fire
        else:
            ids = _ALEX_FEATURE_IDS if net == "alex" else _VGG_FEATURE_IDS
            for j, i in enumerate(ids):
                params["params"]["backbone"][f"conv{j}"] = {
                    "kernel": to_hwio(backbone_state[f"features.{i}.weight"]),
                    "bias": np.asarray(
                        backbone_state[f"features.{i}.bias"], np.float32
                    ),
                }

    return jax.tree_util.tree_map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# Non-learned baseline "fake" metrics (reference networks_basic.py:223-259)
# ---------------------------------------------------------------------------


def l2_distance(in0: Array, in1: Array) -> Array:
    """Per-example mean squared distance (FakeNet 'L2', inputs [-1,1])."""
    d = (in0 - in1) ** 2
    return jnp.mean(d, axis=tuple(range(1, d.ndim)))


def dssim_distance(in0: Array, in1: Array) -> Array:
    """(1 - SSIM) / 2 per example (FakeNet 'DSSIM', RGB colorspace path:
    networks_basic.py:247-253 + util.dssim/tensor2im). The reference maps
    [-1,1] tensors to uint8 [0,255] via tensor2im (truncating cast) and
    scores with data_range=255, channel-averaged SSIM — SSIM's luminance
    term is not shift-invariant, so scoring raw [-1,1] floats would give
    different values. The reference's alternative 'Lab' colorspace needs
    skimage.color (absent in this environment) and is not implemented."""
    from bde2vid_tpu.metrics.basic import structural_similarity

    def to_im(x):  # tensor2im: (x + 1) * 127.5 cast to uint8 (floor for x>=-1)
        return jnp.floor((x + 1.0) * 127.5).clip(0.0, 255.0)

    def one(a, b):
        return (
            1.0 - structural_similarity(to_im(a)[None], to_im(b)[None], data_range=255.0)
        ) / 2.0

    return jax.vmap(one)(in0, in1)


# ---------------------------------------------------------------------------
# Perceptual-study scorers (reference LPIPS/models/dist_model.py:254-330,
# LPIPS/util/util.py:426-457). Pure numpy: the reference iterates torch
# data loaders, but the math is loader-agnostic, so these take arrays (or an
# iterable yielding dict batches for the drop-in variants below).
# ---------------------------------------------------------------------------


def voc_ap(rec: np.ndarray, prec: np.ndarray, use_07_metric: bool = False) -> float:
    """VOC average precision (reference util.voc_ap :426-457).

    Default: exact area under the precision envelope; ``use_07_metric``
    switches to the 11-point interpolation.
    """
    rec = np.asarray(rec, np.float64)
    prec = np.asarray(prec, np.float64)
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = 0.0 if not (rec >= t).any() else float(prec[rec >= t].max())
            ap += p / 11.0
        return ap
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = max(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def score_2afc(d0s: np.ndarray, d1s: np.ndarray, gts: np.ndarray):
    """Two-alternative-forced-choice score (reference :254-290).

    ``d0s``/``d1s`` are distances ref→p0 / ref→p1; ``gts`` in [0,1] is the
    fraction of humans preferring p1. Returns (mean score, detail dict);
    ties score 0.5.
    """
    d0s = np.asarray(d0s, np.float64)
    d1s = np.asarray(d1s, np.float64)
    gts = np.asarray(gts, np.float64)
    scores = (d0s < d1s) * (1.0 - gts) + (d1s < d0s) * gts + (d1s == d0s) * 0.5
    return float(scores.mean()), dict(d0s=d0s, d1s=d1s, gts=gts, scores=scores)


def score_jnd(ds: np.ndarray, sames: np.ndarray):
    """Just-noticeable-difference mAP score (reference :292-330).

    ``ds`` are patch-pair distances, ``sames`` the fraction of humans who
    judged the pair identical. Sorting by distance yields a PR curve over
    "same" as the positive class; the score is its VOC AP.
    """
    ds = np.asarray(ds, np.float64)
    sames = np.asarray(sames, np.float64)
    order = np.argsort(ds)
    sames_sorted = sames[order]
    tps = np.cumsum(sames_sorted)
    fps = np.cumsum(1.0 - sames_sorted)
    fns = sames_sorted.sum() - tps
    precs = tps / np.maximum(tps + fps, 1e-12)
    recs = tps / np.maximum(tps + fns, 1e-12)
    return voc_ap(recs, precs), dict(ds=ds, sames=sames)


def score_2afc_dataset(batches, func):
    """Drop-in for the reference loop: ``batches`` yields dicts with
    'ref'/'p0'/'p1'/'judge' arrays, ``func(a, b) -> per-item distances``."""
    d0s, d1s, gts = [], [], []
    for data in batches:
        d0s += np.asarray(func(data["ref"], data["p0"])).ravel().tolist()
        d1s += np.asarray(func(data["ref"], data["p1"])).ravel().tolist()
        gts += np.asarray(data["judge"]).ravel().tolist()
    return score_2afc(np.array(d0s), np.array(d1s), np.array(gts))


def score_jnd_dataset(batches, func):
    """Drop-in for the reference loop: ``batches`` yields dicts with
    'p0'/'p1'/'same' arrays."""
    ds, sames = [], []
    for data in batches:
        ds += np.asarray(func(data["p0"], data["p1"])).ravel().tolist()
        sames += np.asarray(data["same"]).ravel().tolist()
    return score_jnd(np.array(ds), np.array(sames))


# ---------------------------------------------------------------------------
# Metric training (2AFC): rank net + lin-head trainer
# ---------------------------------------------------------------------------


class Dist2Logit(nn.Module):
    """Two distances -> preference probability (reference Dist2LogitLayer,
    networks_basic.py:177-191: 1x1 convs 5->mid->mid->1 with LeakyReLU(0.2)
    and a sigmoid). Distances here are per-example scalars, so the 1x1
    convs are Dense layers over the 5-feature vector."""

    chn_mid: int = 32

    @nn.compact
    def __call__(self, d0: Array, d1: Array, eps: float = 0.1) -> Array:
        x = jnp.stack(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=-1
        )
        h = nn.leaky_relu(nn.Dense(self.chn_mid, name="fc0")(x), 0.2)
        h = nn.leaky_relu(nn.Dense(self.chn_mid, name="fc1")(h), 0.2)
        return jax.nn.sigmoid(nn.Dense(1, name="fc2")(h))[..., 0]


def bce_ranking_loss(rank_net: Dist2Logit, rank_params, d0, d1, judge) -> Array:
    """BCERankingLoss (networks_basic.py:193-210): judge in [-1, 1] maps to
    a preference probability per=(judge+1)/2; BCE between the rank net's
    logit and per."""
    per = (judge + 1.0) / 2.0
    p = jnp.clip(rank_net.apply(rank_params, d0, d1), 1e-7, 1.0 - 1e-7)
    return -jnp.mean(per * jnp.log(p) + (1.0 - per) * jnp.log(1.0 - p))


def clamp_lin_nonnegative(params):
    """Reference clamp_weights (dist_model.py:173-175): the metric's 1x1 lin
    weights are projected to >= 0 after every optimizer step."""
    return {
        **params,
        "params": {
            k: jnp.maximum(v, 0.0) if k.startswith("lin") else v
            for k, v in params["params"].items()
        },
    }


def compute_2afc_accuracy(d0, d1, judge) -> float:
    """dist_model.compute_accuracy :208-212: fraction of human judgements
    the metric agrees with."""
    d0 = np.asarray(d0).ravel()
    d1 = np.asarray(d1).ravel()
    judge = np.asarray(judge).ravel()
    d1_lt_d0 = (d1 < d0).astype(np.float64)
    return float(np.mean(d1_lt_d0 * judge + (1 - d1_lt_d0) * (1 - judge)))


def make_2afc_train_step(module: LPIPS, rank_net: Dist2Logit, tx):
    """Jitted 2AFC training step over (lpips_params, rank_params)
    (dist_model.forward_train/optimize_parameters :166-206). Only the lin
    heads and the rank net receive gradient (the backbone is frozen, like
    the reference's 'lin' training mode); lin weights are clamped >= 0
    after the update.

    step(lpips_params, rank_params, opt_state, ref, p0, p1, judge)
      -> (lpips_params, rank_params, opt_state, loss)
    judge in [0, 1]: fraction of humans preferring p1 (reference data).
    """
    import optax

    def loss_fn(lin_tree, rank_params, frozen, ref, p0, p1, judge):
        params = {"params": {**frozen, **lin_tree}}
        # reference forward_pair argument order: (ref, p_i)
        d0 = module.apply(params, ref, p0)
        d1 = module.apply(params, ref, p1)
        return bce_ranking_loss(rank_net, rank_params, d0, d1, judge * 2.0 - 1.0)

    @jax.jit
    def step(lpips_params, rank_params, opt_state, ref, p0, p1, judge):
        p = dict(lpips_params["params"])
        lin_tree = {k: v for k, v in p.items() if k.startswith("lin")}
        frozen = {k: v for k, v in p.items() if not k.startswith("lin")}
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            lin_tree, rank_params, frozen, ref, p0, p1, judge
        )
        updates, opt_state = tx.update(grads, opt_state, (lin_tree, rank_params))
        lin_tree, rank_params = optax.apply_updates((lin_tree, rank_params), updates)
        new = clamp_lin_nonnegative({"params": {**frozen, **lin_tree}})
        return new, rank_params, opt_state, loss

    return step
