"""Spiking reconstruction models EVSNN / PA-EVSNN.

Reference: model/EVSNN/model/snn_network.py (EVSNN_LIF_final :359-408,
PAEVSNN_LIF_AMPLIF_final :257-356) and rec_snn_forward.py (the RecSNN
runner :7-56).

Reference state semantics — all made explicit here:
- every firing LIF neuron's membrane persists across bins AND steps (the
  reference resets only by re-instantiating the network, rec_snn_forward:55);
- the spiking resblock uses ONE LIF instance twice per forward (:361-374),
  so its membrane threads through both firings within a step;
- the membrane (Mp) nodes' states are threaded explicitly as
  ``prev_mem_states`` (8 for PA-EVSNN, 1 for EVSNN);
- the model input is ONE voxel bin at a time, (N, H, W, 1); the runner
  LegacyNorm-normalizes the whole voxel then iterates its 5 bins
  (rec_snn_forward :34-44) — reproduced by the ``step``/``__call__`` wrapper;
- output is the final layer's membrane potential (postprocessed with
  robust norm by the eval driver, eval_models_seq.py:246-248).

Checkpoint note: the reference skip layers define pooled-MLP submodules that
their forward never uses (conv2d_pool/fc1/fc2, snn_network.py:86-110); those
keys exist in real checkpoints, so the converter drops them via
``unused_ok`` patterns (see eval/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bde2vid_tpu.models.api import register_model
from bde2vid_tpu.nn.layers import resize_bilinear_2x
from bde2vid_tpu.nn.spiking import lif_step, mp_ada_lif_step, mp_lif_step
from bde2vid_tpu.utils.norm import legacy_norm

Array = jax.Array

TAU = 2.0
V_THRESHOLD = 1.0
V_RESET = None  # soft reset


def _bn(name: str, train: bool, dtype):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
    )


def _conv(f: int, k: int, s: int, p: int, name: str, dtype):
    return nn.Conv(
        f,
        (k, k),
        strides=(s, s),
        padding=((p, p), (p, p)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class SpikingConvLayer(nn.Module):
    """conv(no bias) -> BN -> LIF (reference ConvLayer :39-57). The LIF
    membrane is explicit state."""

    features: int
    kernel_size: int = 5
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, v: Array) -> Tuple[Array, Array]:
        k, s = self.kernel_size, self.stride
        y = _conv(self.features, k, s, k // 2, "conv", self.dtype)(x)
        y = _bn("norm_layer", self.train, self.dtype)(y)
        return lif_step(v, y, TAU, V_THRESHOLD, V_RESET)


class SpikingResidualBlock(nn.Module):
    """conv-BN-LIF-conv-BN + skip -> SAME LIF again (reference :361-374).
    One membrane, fired twice per step."""

    features: int
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, v: Array) -> Tuple[Array, Array]:
        y = _conv(self.features, 3, 1, 1, "conv1", self.dtype)(x)
        y = _bn("bn1", self.train, self.dtype)(y)
        s1, v = lif_step(v, y, TAU, V_THRESHOLD, V_RESET)
        y = _conv(self.features, 3, 1, 1, "conv2", self.dtype)(s1)
        y = _bn("bn2", self.train, self.dtype)(y)
        return lif_step(v, y + x, TAU, V_THRESHOLD, V_RESET)


class SpikeUpsampleLayer(nn.Module):
    """bilinear x2 -> conv(no bias) -> BN -> LIF (reference :377-397)."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, v: Array) -> Tuple[Array, Array]:
        x = resize_bilinear_2x(x)
        k = self.kernel_size
        y = _conv(self.features, k, 1, k // 2, "conv", self.dtype)(x)
        y = _bn("norm_layer", self.train, self.dtype)(y)
        return lif_step(v, y, TAU, V_THRESHOLD, V_RESET)


class MPUpsampleLayer(nn.Module):
    """bilinear x2 -> conv(no bias) -> BN, no neuron (reference :153-166)."""

    features: int
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = resize_bilinear_2x(x)
        k = self.kernel_size
        y = _conv(self.features, k, 1, k // 2, "conv", self.dtype)(x)
        return _bn("norm_layer", self.train, self.dtype)(y)


class GetThetaSimMP(nn.Module):
    """Per-sample leak predictor, 'global'+'mix' flavor (reference :118-151):
    theta = fc2(relu(fc3(cat[maxpool(out), avgpool(x)]))), scalar per sample."""

    reduction_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, out: Array) -> Array:
        theta1 = jnp.max(out, axis=(1, 2))  # AdaptiveMaxPool2d(1)
        theta2 = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        theta = jnp.concatenate([theta1, theta2], axis=-1)
        theta = nn.Dense(self.reduction_dim, dtype=self.dtype, name="fc3")(theta)
        theta = jax.nn.relu(theta)
        return nn.Dense(1, dtype=self.dtype, name="fc2")(theta)  # (N, 1)


class ConvLayerAdaSimMP(nn.Module):
    """conv(no bias) -> BN -> Mp_AdaLIF with pooled-MLP leak
    (reference ConvLayer_ada_simmp :83-116). Note: the reference also
    defines conv2d_pool/fc1/fc2 here that forward never touches; they are
    intentionally absent (checkpoint extras are dropped via unused_ok)."""

    features: int
    kernel_size: int = 1
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, last_mem: Array) -> Array:
        k = self.kernel_size
        out = _conv(self.features, k, 1, k // 2, "conv", self.dtype)(x)
        out = _bn("norm_layer", self.train, self.dtype)(out)
        w = GetThetaSimMP(self.features // 4, dtype=self.dtype, name="get_theta")(x, out)
        return mp_ada_lif_step(last_mem, out, w[:, None, None, :])


class SpikeSkipLayer(nn.Module):
    """Spike_skip_layer (reference :73-80): delegates to ConvLayerAdaSimMP
    under a ``conv`` child, matching the torch key layout (skipN.conv.*)."""

    features: int
    kernel_size: int = 1
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, last_mem: Array) -> Array:
        return ConvLayerAdaSimMP(
            self.features,
            self.kernel_size,
            dtype=self.dtype,
            train=self.train,
            name="conv",
        )(x, last_mem)


class TemporalFlatLayerConcat(nn.Module):
    """conv 1x1 (64->1, no bias) -> BN -> MpLIF (reference :240-255)."""

    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, last_mem: Array) -> Array:
        out = _conv(1, 1, 1, 0, "conv", self.dtype)(x)
        out = _bn("norm_layer", self.train, self.dtype)(out)
        return mp_lif_step(last_mem, out, TAU)


class TemporalFlatLayerAdaSimMPConcat(nn.Module):
    """conv 1x1 (64->32, no bias) -> BN -> Mp_AdaLIF (reference :400-433)."""

    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, last_mem: Array) -> Array:
        out = _conv(32, 1, 1, 0, "conv", self.dtype)(x)
        out = _bn("norm_layer", self.train, self.dtype)(out)
        w = GetThetaSimMP(32 // 4, dtype=self.dtype, name="get_theta")(x, out)
        return mp_ada_lif_step(last_mem, out, w[:, None, None, :])


def _lif_state_shapes(h: int, w: int):
    """Membrane shapes for the shared encoder/decoder LIF stack."""
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    h4, w4 = (h2 + 1) // 2, (w2 + 1) // 2
    h8, w8 = (h4 + 1) // 2, (w4 + 1) // 2
    return {
        "static_conv": (h, w, 32),
        "down1": (h2, w2, 64),
        "down2": (h4, w4, 128),
        "down3": (h8, w8, 256),
        "resblock": (h8, w8, 256),
        "up1": (h4, w4, 128),
        "up2": (h2, w2, 64),
        "up3": (h, w, 32),
    }


class SpikeRecurrentConv(nn.Module):
    """Spike_recurrentConvLayer_nolstm (reference :60-71): wraps a
    SpikingConvLayer under a ``conv`` child so the torch key layout
    (downN.conv.conv2d...) maps 1:1."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, v: Array) -> Tuple[Array, Array]:
        return SpikingConvLayer(
            self.features,
            self.kernel_size,
            self.stride,
            dtype=self.dtype,
            train=self.train,
            name="conv",
        )(x, v)


class _SNNBase(nn.Module):
    """Shared encoder/decoder trunk; children are created in the SUBCLASS
    compact scope so flax paths mirror the torch state-dict exactly
    (static_conv.{0,1}, downN.conv.*, residualBlock.0.*, upN.*)."""

    config: Dict[str, Any] = None
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    def _make_trunk_layers(self):
        """Instantiate trunk submodules ONCE (bin loop reuses them; compact
        modules may be called repeatedly but created only once)."""
        d, t = self.dtype, self.train
        return {
            "static_conv0": _conv(32, 5, 1, 2, "static_conv0", d),
            "static_conv1": _bn("static_conv1", t, d),
            "down1": SpikeRecurrentConv(64, 5, 2, dtype=d, train=t, name="down1"),
            "down2": SpikeRecurrentConv(128, 5, 2, dtype=d, train=t, name="down2"),
            "down3": SpikeRecurrentConv(256, 5, 2, dtype=d, train=t, name="down3"),
            "residualBlock0": SpikingResidualBlock(
                256, dtype=d, train=t, name="residualBlock0"
            ),
            "up1": SpikeUpsampleLayer(128, dtype=d, train=t, name="up1"),
            "up2": SpikeUpsampleLayer(64, dtype=d, train=t, name="up2"),
            "up3": SpikeUpsampleLayer(32, dtype=d, train=t, name="up3"),
        }

    @staticmethod
    def _trunk(L, x, lif):
        new = {}
        y = L["static_conv1"](L["static_conv0"](x))
        x_in, new["static_conv"] = lif_step(lif["static_conv"], y, TAU, V_THRESHOLD, V_RESET)
        x1, new["down1"] = L["down1"](x_in, lif["down1"])
        x2, new["down2"] = L["down2"](x1, lif["down2"])
        x3, new["down3"] = L["down3"](x2, lif["down3"])
        r1, new["resblock"] = L["residualBlock0"](x3, lif["resblock"])
        u1, new["up1"] = L["up1"](jnp.concatenate([r1, x3], -1), lif["up1"])
        u2, new["up2"] = L["up2"](jnp.concatenate([u1, x2], -1), lif["up2"])
        u3, new["up3"] = L["up3"](jnp.concatenate([u2, x1], -1), lif["up3"])
        return x_in, x1, x2, x3, r1, u1, u2, u3, new


def _bin_fold(one_bin, voxel, state, normalize_input=True):
    """Normalize the voxel (rec_snn_forward:34-35 — torch ``tensor.std()``
    on the nonzero subset, i.e. the UNBIASED estimator, not the dataset
    LegacyNorm's population std) then fold its B bins through the net
    (rec_snn_forward:37-44). The bin count is small and static (default 5)
    so the loop is unrolled — flax module creation inside lax.scan is not
    allowed, and XLA fuses the unrolled steps. ``normalize_input=False``
    lets callers that pre-normalize (the rec_snn CLI feeds single bins)
    skip the per-call norm."""
    if normalize_input:
        # PER SAMPLE, like the reference's per-tensor norm (its runner only
        # ever sees one sample): one batch-wide mean/std would let sample
        # A's event density shift sample B's normalized input at N>1
        voxel = jax.vmap(lambda v: legacy_norm(v, unbiased=True))(voxel)
    img = None
    for j in range(voxel.shape[-1]):
        img, state = one_bin(voxel[..., j:j + 1], state)
    return img, state


@register_model("EVSNN")
class EVSNN(_SNNBase):
    """EVSNN_LIF_final (reference :359-408): spiking UNet whose output is the
    membrane of a 1-channel temporal-flat integrator."""

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        L = self._make_trunk_layers()
        temporalflat = TemporalFlatLayerConcat(
            dtype=self.dtype, train=self.train, name="temporalflat"
        )

        def one_bin(x, st):
            x_in, x1, x2, x3, r1, u1, u2, u3, new_lif = self._trunk(L, x, st["lif"])
            mem = temporalflat(jnp.concatenate([u3, x_in], -1), st["mp"])
            return mem, {"lif": new_lif, "mp": mem}

        img, new_state = _bin_fold(
            one_bin, voxel, state,
            (self.config or {}).get("normalize_input", True),
        )
        return {"image": img}, new_state

    def initial_state(self, batch, height, width, dtype=None):
        dtype = dtype or jnp.float32
        lif = {
            k: jnp.zeros((batch, *shape), dtype)
            for k, shape in _lif_state_shapes(height, width).items()
        }
        return {"lif": lif, "mp": jnp.zeros((batch, height, width, 1), dtype)}


@register_model("PAEVSNN")
class PAEVSNN(_SNNBase):
    """PAEVSNN_LIF_AMPLIF_final (reference :257-356): adds 8 membrane
    skip/aggregation paths with per-sample adaptive leaks."""

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        L = self._make_trunk_layers()
        mk_skip = lambda name: SpikeSkipLayer(
            32, 1, dtype=self.dtype, train=self.train, name=name
        )
        skips = {n: mk_skip(n) for n in
                 ("skip0", "skip1", "skip2", "skip3", "up1mp", "up2mp", "up3mp")}
        aggs = {n: MPUpsampleLayer(32, dtype=self.dtype, train=self.train, name=n)
                for n in ("aggregation1", "aggregation2", "aggregation3")}
        temporalflat = TemporalFlatLayerAdaSimMPConcat(
            dtype=self.dtype, train=self.train, name="temporalflat"
        )
        final = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name="final0")

        def one_bin(x, st):
            x_in, x1, x2, x3, r1, u1, u2, u3, new_lif = self._trunk(L, x, st["lif"])
            mp = st["mp"]
            s0 = skips["skip0"](x_in, mp[0])
            s1 = skips["skip1"](x1, mp[1])
            s2 = skips["skip2"](x2, mp[2])
            s3 = skips["skip3"](x3, mp[3])
            up1mp = skips["up1mp"](r1, mp[4])
            up2mp = skips["up2mp"](u1, mp[5])
            up3mp = skips["up3mp"](u2, mp[6])
            a1 = aggs["aggregation1"](s3 + up1mp)
            a2 = aggs["aggregation2"](a1 + (s2 + up2mp))
            a3 = aggs["aggregation3"](a2 + (s1 + up3mp))
            mem = temporalflat(jnp.concatenate([u3, x_in], -1), mp[7])
            img = final(mem + a3 + s0)
            new_mp = (s0, s1, s2, s3, up1mp, up2mp, up3mp, mem)
            return img, {"lif": new_lif, "mp": new_mp}

        img, new_state = _bin_fold(
            one_bin, voxel, state,
            (self.config or {}).get("normalize_input", True),
        )
        return {"image": img}, new_state

    def initial_state(self, batch, height, width, dtype=None):
        dtype = dtype or jnp.float32
        h, w = height, width
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        h4, w4 = (h2 + 1) // 2, (w2 + 1) // 2
        h8, w8 = (h4 + 1) // 2, (w4 + 1) // 2
        z = lambda hh, ww, c: jnp.zeros((batch, hh, ww, c), dtype)
        lif = {
            k: jnp.zeros((batch, *shape), dtype)
            for k, shape in _lif_state_shapes(height, width).items()
        }
        mp = (
            z(h, w, 32),  # skip0
            z(h2, w2, 32),  # skip1
            z(h4, w4, 32),  # skip2
            z(h8, w8, 32),  # skip3
            z(h8, w8, 32),  # up1mp
            z(h4, w4, 32),  # up2mp
            z(h2, w2, 32),  # up3mp
            z(h, w, 32),  # temporalflat
        )
        return {"lif": lif, "mp": mp}
