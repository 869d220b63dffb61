"""Recurrent convolutional cells as pure (x, state) -> (y, state) functions.

Reference: model/e2vid/submodules.py ConvLSTM :250-307 (gate order
i, f, o, g via a single 4x-channel conv over concat(x, h)), ConvGRU :309-348
(three separate convs; candidate uses reset-scaled hidden), RecurrentConvLayer
:110-129, RecurrentResidualLayer :350-373.

The reference hides state in module attributes and lazily allocates zeros;
here state is an explicit pytree created by ``initial_state`` and threaded by
the caller (typically through ``lax.scan`` — the TPU-native formulation).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bde2vid_tpu.nn.layers import ConvLayer, ResidualBlock

Array = jax.Array


def lstm_initial_state(batch: int, h: int, w: int, hidden: int, dtype=jnp.float32):
    z = jnp.zeros((batch, h, w, hidden), dtype)
    return (z, z)


def gru_initial_state(batch: int, h: int, w: int, hidden: int, dtype=jnp.float32):
    return jnp.zeros((batch, h, w, hidden), dtype)


class ConvLSTMCell(nn.Module):
    """4-gate conv LSTM. One conv over concat(x, h) -> 4*hidden channels,
    chunked in torch channel order (i, f, o, g)."""

    hidden: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, state: Tuple[Array, Array]) -> Tuple[Array, Tuple[Array, Array]]:
        prev_h, prev_c = state
        k = self.kernel_size
        p = k // 2
        gates = nn.Conv(
            4 * self.hidden,
            (k, k),
            padding=((p, p), (p, p)),
            dtype=self.dtype,
            name="gates",
        )(jnp.concatenate([x, prev_h.astype(x.dtype)], axis=-1))
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * prev_c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)

    @staticmethod
    def initial_state(batch, height, width, hidden, dtype=jnp.float32):
        return lstm_initial_state(batch, height, width, hidden, dtype)


class ConvGRUCell(nn.Module):
    """3-gate conv GRU (reset / update / candidate), orthogonal-initialized.

    new_h = prev*(1-z) + cand*z with cand = tanh(conv([x, prev*r])), matching
    the reference update equation exactly.
    """

    hidden: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, state: Array) -> Tuple[Array, Array]:
        prev = state.astype(x.dtype)
        k = self.kernel_size
        p = k // 2
        init = nn.initializers.orthogonal()
        conv = lambda name: nn.Conv(
            self.hidden,
            (k, k),
            padding=((p, p), (p, p)),
            kernel_init=init,
            dtype=self.dtype,
            name=name,
        )
        xin = jnp.concatenate([x, prev], axis=-1)
        update = jax.nn.sigmoid(conv("update_gate")(xin))
        reset = jax.nn.sigmoid(conv("reset_gate")(xin))
        cand = jnp.tanh(conv("out_gate")(jnp.concatenate([x, prev * reset], axis=-1)))
        new = prev * (1.0 - update) + cand * update
        return new, new

    @staticmethod
    def initial_state(batch, height, width, hidden, dtype=jnp.float32):
        return gru_initial_state(batch, height, width, hidden, dtype)


def make_recurrent_cell(
    block_type: str, features: int, kernel_size: int = 3,
    dtype=jnp.float32, name: str = "recurrent_block",
):
    """Shared cell factory (reference asserts the type, RecurrentConvLayer
    :113: assert recurrent_block_type in ['convlstm', 'convgru'])."""
    if block_type == "convlstm":
        return ConvLSTMCell(features, kernel_size, dtype=dtype, name=name)
    if block_type == "convgru":
        return ConvGRUCell(features, kernel_size, dtype=dtype, name=name)
    raise ValueError(
        f"unknown recurrent_block_type {block_type!r} (convlstm|convgru)"
    )


def recurrent_initial_state(
    block_type: str, batch: int, h: int, w: int, hidden: int, dtype=jnp.float32
):
    if block_type == "convlstm":
        return lstm_initial_state(batch, h, w, hidden, dtype)
    if block_type == "convgru":
        return gru_initial_state(batch, h, w, hidden, dtype)
    raise ValueError(
        f"unknown recurrent_block_type {block_type!r} (convlstm|convgru)"
    )


class RecurrentConvLayer(nn.Module):
    """Strided ConvLayer followed by a recurrent cell (reference :110-129).

    Covers both the reference's explicit-state ``RecurrentConvLayer`` and the
    attribute-state ``RecurrentConv`` — state is always explicit here.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    recurrent_block_type: str = "convlstm"
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, state):
        x = ConvLayer(
            self.features,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            activation=self.activation,
            norm=self.norm,
            dtype=self.dtype,
            train=self.train,
            name="conv",
        )(x)
        cell = self._cell()
        return cell(x, state)

    def _cell(self):
        return make_recurrent_cell(self.recurrent_block_type, self.features, 3, self.dtype)

    def initial_state(self, batch, height, width, dtype=jnp.float32):
        """State shape is at the post-conv (strided) resolution."""
        oh = (height + 2 * self.padding - self.kernel_size) // self.stride + 1
        ow = (width + 2 * self.padding - self.kernel_size) // self.stride + 1
        return recurrent_initial_state(
            self.recurrent_block_type, batch, oh, ow, self.features, dtype
        )


class RecurrentUpConv(nn.Module):
    """Recurrent cell -> bilinear x2 -> conv -> norm -> act
    (reference model/submodules.py:226-264). Explicit state."""

    features: int
    kernel_size: int = 5
    padding: int = 0
    recurrent_block_type: str = "convlstm"
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, state):
        from bde2vid_tpu.nn.layers import _make_norm, get_activation, resize_bilinear_2x

        cell = make_recurrent_cell(self.recurrent_block_type, self.features, 3, self.dtype)
        y, new_state = cell(x, state)
        y = resize_bilinear_2x(y)
        k, p = self.kernel_size, self.padding
        y = nn.Conv(
            self.features,
            (k, k),
            padding=((p, p), (p, p)),
            use_bias=self.norm != "BN",
            dtype=self.dtype,
            name="conv",
        )(y)
        norm = _make_norm(self.norm, self.features, self.dtype, self.train)
        if norm is not None:
            y = norm(y)
        return get_activation(self.activation)(y), new_state

    def initial_state(self, batch, height, width, dtype=jnp.float32):
        return recurrent_initial_state(
            self.recurrent_block_type, batch, height, width, self.features, dtype
        )


class DownsampleRecurrentConvLayer(nn.Module):
    """Recurrent cell -> bilinear x0.5 -> activation
    (reference model/submodules.py:303-321)."""

    features: int
    kernel_size: int = 3
    recurrent_block_type: str = "convlstm"
    activation: Optional[str] = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, state):
        from bde2vid_tpu.nn.layers import get_activation, resize_bilinear_half

        cell = make_recurrent_cell(
            self.recurrent_block_type, self.features, self.kernel_size, self.dtype
        )
        y, new_state = cell(x, state)
        return get_activation(self.activation)(resize_bilinear_half(y)), new_state

    def initial_state(self, batch, height, width, dtype=jnp.float32):
        return recurrent_initial_state(
            self.recurrent_block_type, batch, height, width, self.features, dtype
        )


class RecurrentResidualLayer(nn.Module):
    """ResidualBlock + recurrent cell (reference :350-373, used by FireNetOrg)."""

    features: int
    recurrent_block_type: str = "convgru"
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x: Array, state):
        x = ResidualBlock(
            self.features, norm=self.norm, dtype=self.dtype, train=self.train, name="conv"
        )(x)
        cell = make_recurrent_cell(self.recurrent_block_type, self.features, 3, self.dtype)
        return cell(x, state)

    def initial_state(self, batch, height, width, dtype=jnp.float32):
        return recurrent_initial_state(
            self.recurrent_block_type, batch, height, width, self.features, dtype
        )
