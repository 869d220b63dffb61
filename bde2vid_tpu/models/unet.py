"""UNet backbone family (reference: model/e2vid/unet.py).

- UNet           (:93-137)  plain encoder/resblock/decoder UNet
- UNetRecurrent  (:139-200) each encoder followed by a ConvLSTM/GRU
- UNetFire       (:203-278) recurrent head + (optionally recurrent) resblocks
- UNetFlow       (:281-338) 3-channel output, image = channel 0

TPU-first: NHWC, explicit state pytrees, no hidden attributes. The channel
doubling per level, k=5 stride-2 encoders with torch padding, skip sum/concat,
and sigmoid prediction head all match the reference defaults so converted
checkpoints are drop-in.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bde2vid_tpu.nn.layers import (
    ConvLayer,
    ResidualBlock,
    TransposedConvLayer,
    UpsampleConvLayer,
    get_activation,
    skip_concat,
    skip_sum,
)
from bde2vid_tpu.nn.recurrent import (
    RecurrentConvLayer,
    RecurrentResidualLayer,
    gru_initial_state,
    lstm_initial_state,
)

Array = jax.Array


def _skip(skip_type: Optional[str]):
    if skip_type == "sum":
        return skip_sum
    if skip_type == "concat":
        return skip_concat
    if skip_type in (None, "no_skip"):
        return lambda x1, x2=None: x1
    raise KeyError(f"unknown skip_type {skip_type!r}")


class _UNetBase(nn.Module):
    """Shared config (reference BaseUNet :28-91)."""

    num_bins: int = 5
    num_output_channels: int = 1
    skip_type: str = "sum"
    activation: Optional[str] = "sigmoid"
    num_encoders: int = 4
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    kernel_size: int = 5
    recurrent_block_type: str = "convlstm"
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @property
    def encoder_input_sizes(self):
        return [self.base_num_channels * 2**i for i in range(self.num_encoders)]

    @property
    def encoder_output_sizes(self):
        return [self.base_num_channels * 2 ** (i + 1) for i in range(self.num_encoders)]

    @property
    def max_num_channels(self):
        return self.base_num_channels * 2**self.num_encoders

    def _resblocks(self):
        return [
            ResidualBlock(
                self.max_num_channels,
                norm=self.norm,
                dtype=self.dtype,
                train=self.train,
                name=f"resblock{i}",
            )
            for i in range(self.num_residual_blocks)
        ]

    def _decoders(self):
        """Decoder input sizes reversed; each halves channels (reference :79-87)."""
        Up = UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer
        sizes = list(reversed(self.encoder_output_sizes))
        decs = []
        for i, s in enumerate(sizes):
            decs.append(
                Up(
                    s // 2,
                    kernel_size=5,
                    padding=2,
                    norm=self.norm,
                    dtype=self.dtype,
                    train=self.train,
                    name=f"decoder{i}",
                )
            )
        return decs

    def _pred(self):
        return ConvLayer(
            self.num_output_channels,
            kernel_size=1,
            padding=0,
            activation=None,
            norm=self.norm,
            dtype=self.dtype,
            train=self.train,
            name="pred",
        )


class UNet(_UNetBase):
    """Non-recurrent UNet (reference :93-137)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        apply_skip = _skip(self.skip_type)
        x = ConvLayer(
            self.base_num_channels, 5, padding=2, dtype=self.dtype, train=self.train, name="head"
        )(x)
        head = x
        blocks = []
        for i, out_size in enumerate(self.encoder_output_sizes):
            x = ConvLayer(
                out_size,
                5,
                stride=2,
                padding=2,
                norm=self.norm,
                dtype=self.dtype,
                train=self.train,
                name=f"encoder{i}",
            )(x)
            blocks.append(x)
        for rb in self._resblocks():
            x = rb(x)
        for i, dec in enumerate(self._decoders()):
            x = dec(apply_skip(x, blocks[self.num_encoders - i - 1]))
        img = self._pred()(apply_skip(x, head))
        return get_activation(self.activation)(img)


class UNetRecurrent(_UNetBase):
    """UNet with a recurrent cell after every encoder (reference :139-200)."""

    def _enc_kernel(self) -> int:
        """Head/encoder kernel. The reference UNetRecurrent HARDCODES 5
        (unet.py:153-160) while its UNetFlow subclass builds from the
        configurable kernel_size (unet.py:293-300) — subclass hook."""
        return 5

    @nn.compact
    def __call__(self, x: Array, states: Tuple) -> Tuple[Array, Tuple]:
        apply_skip = _skip(self.skip_type)
        k = self._enc_kernel()
        x = ConvLayer(
            self.base_num_channels, k, padding=k // 2, dtype=self.dtype,
            train=self.train, name="head"
        )(x)
        head = x
        blocks = []
        new_states = []
        for i, out_size in enumerate(self.encoder_output_sizes):
            x, st = RecurrentConvLayer(
                out_size,
                kernel_size=k,
                stride=2,
                padding=k // 2,
                recurrent_block_type=self.recurrent_block_type,
                norm=self.norm,
                dtype=self.dtype,
                train=self.train,
                name=f"encoder{i}",
            )(x, states[i])
            blocks.append(x)
            new_states.append(st)
        for rb in self._resblocks():
            x = rb(x)
        for i, dec in enumerate(self._decoders()):
            x = dec(apply_skip(x, blocks[self.num_encoders - i - 1]))
        img = self._pred()(apply_skip(x, head))
        return get_activation(self.activation)(img), tuple(new_states)

    def initial_state(self, batch: int, height: int, width: int, dtype=None):
        dtype = dtype or self.dtype
        k = self._enc_kernel()
        states = []
        h, w = height, width
        for out_size in self.encoder_output_sizes:
            h = (h + 2 * (k // 2) - k) // 2 + 1
            w = (w + 2 * (k // 2) - k) // 2 + 1
            if self.recurrent_block_type == "convlstm":
                states.append(lstm_initial_state(batch, h, w, out_size, dtype))
            else:
                states.append(gru_initial_state(batch, h, w, out_size, dtype))
        return tuple(states)


class UNetFire(_UNetBase):
    """FireNet-org backbone (reference :203-278): recurrent head + resblocks,
    no up/downsampling, 1x1 pred with NO output activation."""

    recurrent_blocks_cfg: Tuple[int, ...] = (0,)  # indices of recurrent resblocks

    @nn.compact
    def __call__(self, x: Array, states: Tuple) -> Tuple[Array, Tuple]:
        k = self.kernel_size
        new_states = []
        sidx = 0
        x, st = RecurrentConvLayer(
            self.base_num_channels,
            kernel_size=k,
            padding=k // 2,
            recurrent_block_type=self.recurrent_block_type,
            norm=self.norm,
            dtype=self.dtype,
            train=self.train,
            name="head",
        )(x, states[sidx])
        new_states.append(st)
        sidx += 1
        rec = set(self.recurrent_blocks_cfg)
        for i in range(self.num_residual_blocks):
            if i in rec or -1 in rec:
                x, st = RecurrentResidualLayer(
                    self.base_num_channels,
                    recurrent_block_type=self.recurrent_block_type,
                    norm=self.norm,
                    dtype=self.dtype,
                    train=self.train,
                    name=f"resblock{i}",
                )(x, states[sidx])
                new_states.append(st)
                sidx += 1
            else:
                x = ResidualBlock(
                    self.base_num_channels,
                    norm=self.norm,
                    dtype=self.dtype,
                    train=self.train,
                    name=f"resblock{i}",
                )(x)
        img = ConvLayer(
            self.num_output_channels,
            kernel_size=1,
            padding=0,
            activation=None,
            dtype=self.dtype,
            name="pred",
        )(x)
        return img, tuple(new_states)

    def initial_state(self, batch: int, height: int, width: int, dtype=None):
        dtype = dtype or self.dtype
        mk = (
            (lambda: lstm_initial_state(batch, height, width, self.base_num_channels, dtype))
            if self.recurrent_block_type == "convlstm"
            else (lambda: gru_initial_state(batch, height, width, self.base_num_channels, dtype))
        )
        n_units = 1
        rec = set(self.recurrent_blocks_cfg)
        for i in range(self.num_residual_blocks):
            if i in rec or -1 in rec:
                n_units += 1
        return tuple(mk() for _ in range(n_units))


class UNetFlow(UNetRecurrent):
    """UNetRecurrent with 3 output channels and no activation; the image is
    channel 0, the remaining 2 channels are flow (reference :281-338).
    Unlike its parent, the reference UNetFlow builds head/encoders from the
    CONFIGURABLE kernel_size (unet.py:293-300) — honored here so non-k5
    FlowNet checkpoints convert."""

    num_output_channels: int = 3
    activation: Optional[str] = None

    def _enc_kernel(self) -> int:
        return self.kernel_size
