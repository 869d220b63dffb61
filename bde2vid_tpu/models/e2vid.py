"""E2VID model-family wrappers (reference: model/e2vid/model.py).

Each wrapper maps the reference config-dict surface onto the UNet backbones
and exposes the common functional protocol:

    model(voxel_NHWC, state) -> ({'image': ..., [extra]}, state)
    model.initial_state(batch, H, W) -> state pytree

The reference holds state in ``self.prev_states`` and resets via
``reset_states()``; here "reset" == pass a fresh ``initial_state`` —
referentially transparent and scan-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bde2vid_tpu.nn.layers import ConvLayer, ResidualBlock
from bde2vid_tpu.nn.recurrent import (
    ConvGRUCell,
    gru_initial_state,
    lstm_initial_state,
)
from bde2vid_tpu.models.unet import UNet, UNetFire, UNetFlow, UNetRecurrent
from bde2vid_tpu.models.api import register_model

Array = jax.Array


def _unet_common(config: Dict[str, Any]) -> Dict[str, Any]:
    """Config unpacking with reference defaults (model/e2vid/model.py:18-55)."""
    return dict(
        num_bins=int(config["num_bins"]),
        skip_type=str(config.get("skip_type", "sum")),
        num_encoders=int(config.get("num_encoders", 4)),
        base_num_channels=int(config.get("base_num_channels", 32)),
        num_residual_blocks=int(config.get("num_residual_blocks", 2)),
        norm=config.get("norm", None),
        use_upsample_conv=bool(config.get("use_upsample_conv", True)),
        # NOTE: no kernel_size — UNet/UNetRecurrent hardcode k=5 like the
        # reference; FireNetOrg reads kernel_size from config directly
    )


@register_model("E2VID")
class E2VID(nn.Module):
    """Non-recurrent E2VID (reference :58-78). Stateless; state arg is ()."""

    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, voxel: Array, state=()) -> Tuple[Dict[str, Array], Tuple]:
        kw = _unet_common(self.config)
        img = UNet(
            num_output_channels=1,
            activation="sigmoid",
            dtype=self.dtype,
            train=self.train,
            name="unet",
            **kw,
        )(voxel)
        return {"image": img}, ()

    def initial_state(self, batch, height, width, dtype=None):
        return ()


@register_model("E2VIDRecurrent")
class E2VIDRecurrent(nn.Module):
    """Recurrent E2VID (reference :81-117), the classic model."""

    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.nowrap
    def _backbone(self, name="unetrecurrent"):
        # name=None for out-of-scope uses (initial_state shape queries):
        # flax forbids NAMED top-level module construction outside a scope
        kw = _unet_common(self.config)
        return UNetRecurrent(
            num_output_channels=1,
            activation="sigmoid",
            recurrent_block_type=str(self.config.get("recurrent_block_type", "convlstm")),
            dtype=self.dtype,
            train=self.train,
            name=name,
            **kw,
        )

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        img, new_state = self._backbone()(voxel, state)
        return {"image": img}, new_state

    @nn.nowrap
    def initial_state(self, batch, height, width, dtype=None):
        # single source of truth: the backbone's own state-shape arithmetic
        return self._backbone(name=None).initial_state(
            batch, height, width, dtype or self.dtype
        )


@register_model("FireNet")
class FireNet(nn.Module):
    """Lightweight refactored FireNet (reference :120-168):
    head conv -> GRU -> resblock -> GRU -> resblock -> 1x1 pred (no act)."""

    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        c = int(self.config.get("base_num_channels", 16))
        k = int(self.config.get("kernel_size", 3))
        x = ConvLayer(c, k, padding=k // 2, dtype=self.dtype, name="head")(voxel)
        x, s0 = ConvGRUCell(c, k, dtype=self.dtype, name="G1")(x, state[0])
        x = ResidualBlock(c, dtype=self.dtype, train=self.train, name="R1")(x)
        x, s1 = ConvGRUCell(c, k, dtype=self.dtype, name="G2")(x, state[1])
        x = ResidualBlock(c, dtype=self.dtype, train=self.train, name="R2")(x)
        img = ConvLayer(1, 1, padding=0, activation=None, dtype=self.dtype, name="pred")(x)
        return {"image": img}, (s0, s1)

    def initial_state(self, batch, height, width, dtype=None):
        c = int(self.config.get("base_num_channels", 16))
        dtype = dtype or self.dtype
        return (
            gru_initial_state(batch, height, width, c, dtype),
            gru_initial_state(batch, height, width, c, dtype),
        )


@register_model("FireNetOrg")
class FireNetOrg(nn.Module):
    """Original FireNet via UNetFire (reference :171-199)."""

    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.nowrap
    def _backbone(self, name="net"):
        rec_blocks = self.config.get("recurrent_blocks", {"resblock": [0]})
        return UNetFire(
            num_bins=int(self.config["num_bins"]),
            num_output_channels=1,
            skip_type=str(self.config.get("skip_type", "sum")),
            recurrent_block_type=str(self.config.get("recurrent_block_type", "convgru")),
            base_num_channels=int(self.config.get("base_num_channels", 16)),
            num_residual_blocks=int(self.config.get("num_residual_blocks", 2)),
            norm=self.config.get("norm", None),
            kernel_size=int(self.config.get("kernel_size", 3)),
            recurrent_blocks_cfg=tuple(rec_blocks.get("resblock", [])),
            dtype=self.dtype,
            train=self.train,
            name=name,
        )

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        img, new_state = self._backbone()(voxel, state)
        return {"image": img}, new_state

    @nn.nowrap
    def initial_state(self, batch, height, width, dtype=None):
        # single source of truth: UNetFire's own recurrent-unit counting
        return self._backbone(name=None).initial_state(
            batch, height, width, dtype or self.dtype
        )


@register_model("FlowNet")
class FlowNet(nn.Module):
    """UNetFlow wrapper (reference :237-258): 3-channel head, image = ch 0."""

    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.nowrap
    def _backbone(self, name="unetflow"):
        kw = _unet_common(self.config)
        return UNetFlow(
            recurrent_block_type=str(self.config.get("recurrent_block_type", "convlstm")),
            # unlike UNet/UNetRecurrent (hardcoded k=5), the reference
            # UNetFlow builds head/encoders from the configurable
            # kernel_size (unet.py:293-300)
            kernel_size=int(self.config.get("kernel_size", 5)),
            dtype=self.dtype,
            train=self.train,
            name=name,
            **kw,
        )

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        out, new_state = self._backbone()(voxel, state)
        return {"image": out[..., 0:1], "flow": out[..., 1:3]}, new_state

    @nn.nowrap
    def initial_state(self, batch, height, width, dtype=None):
        # single source of truth: the backbone's own state-shape arithmetic
        return self._backbone(name=None).initial_state(
            batch, height, width, dtype or self.dtype
        )
