"""Transformer encoder/decoder blocks for EITR.

Reference: model/eitr/transformer_encoder.py:7-91, transformer_decoder.py:
7-97, position_encoding.py:7-36. Pre-norm layers with the reference's exact
residual wiring; positions are added ONCE to the encoder input (the
``with_embed`` at TransformerEncoder.forward:40), not per layer.

Attention uses a packed qkv projection parameterized to mirror torch
``nn.MultiheadAttention`` (in_proj_weight/out_proj) so checkpoint conversion
is a transpose. Dropout is inference-off (the eval path never trains these).
Tokens are (N, S, C) — batch first, TPU-friendly; the MXU sees one big
(S, C) x (C, 3C) matmul per batch.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class MultiheadAttention(nn.Module):
    """torch-compatible MHA: packed in-projection + out-projection."""

    d_model: int
    nhead: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        d = self.d_model
        in_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (d, 3 * d), jnp.float32
        )
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,), jnp.float32)
        wq, wk, wv = jnp.split(in_kernel.astype(q.dtype), 3, axis=1)
        bq, bk, bv = jnp.split(in_bias.astype(q.dtype), 3)
        qh = q @ wq + bq
        kh = k @ wk + bk
        vh = v @ wv + bv

        n, s, _ = qh.shape
        hd = d // self.nhead

        def heads(x):
            return x.reshape(n, -1, self.nhead, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qh), heads(kh), heads(vh)
        attn = jnp.einsum("nhsd,nhtd->nhst", qh, kh) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhst,nhtd->nhsd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(n, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm: norm1 -> self-attn -> +res; norm2 -> FFN -> +res."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: Array) -> Array:
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
        src = src + MultiheadAttention(
            self.d_model, self.nhead, dtype=self.dtype, name="self_attn"
        )(q, q, q)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(jax.nn.relu(y))
        return src + y


class TransformerDecoderLayer(nn.Module):
    """Pre-norm self-attn + cross-attn (separate norms for q and memory kv,
    reference norm21/norm22) + FFN."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array) -> Array:
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        tgt = tgt + MultiheadAttention(
            self.d_model, self.nhead, dtype=self.dtype, name="self_attn"
        )(q, q, q)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm21")(tgt)
        kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm22")(memory)
        tgt = tgt + MultiheadAttention(
            self.d_model, self.nhead, dtype=self.dtype, name="cross_attn"
        )(q, kv, kv)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(jax.nn.relu(y))
        return tgt + y


class TransformerEncoder(nn.Module):
    """Stack; positions added ONCE to the input (reference :36-45)."""

    d_model: int = 256
    nhead: int = 8
    num_layers: int = 3
    dim_feedforward: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: Array, pos: Optional[Array] = None) -> Array:
        out = src if pos is None else src + pos
        for i in range(self.num_layers):
            out = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                dtype=self.dtype,
                name=f"layers{i}",
            )(out)
        return out


class TransformerDecoder(nn.Module):
    d_model: int = 256
    nhead: int = 8
    num_layers: int = 2
    dim_feedforward: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array) -> Array:
        out = tgt
        for i in range(self.num_layers):
            out = TransformerDecoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                dtype=self.dtype,
                name=f"layers{i}",
            )(tgt=out, memory=memory)
        return out


def sine_position_table(n_position: int, d_model: int) -> np.ndarray:
    """Sinusoid table P[pos, 2i]=sin, P[pos, 2i+1]=cos over pos/10000^(2i/d)
    (reference position_encoding.py:15-24). Returns (n_position, d_model)."""
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_model)[None, :]
    angle = pos / np.power(10000.0, 2 * (j // 2) / d_model)
    table = np.zeros((n_position, d_model), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class GenericTransformerEncoderLayer(nn.Module):
    """POST-norm encoder layer with positions re-added to q/k at every
    layer (the reference's generic eitr/transformer.py:65-96 — a distinct
    variant from the pre-norm layers EITR's u_trans path uses)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src: Array, pos: Optional[Array] = None) -> Array:
        q = src if pos is None else src + pos
        attn = MultiheadAttention(
            self.d_model, self.nhead, dtype=self.dtype, name="self_attn"
        )(q, q, src)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src + attn)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(jax.nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src + y)


class GenericTransformerDecoderLayer(nn.Module):
    """POST-norm decoder layer; the task embedding joins the queries of
    both attentions (reference eitr/transformer.py:98-139)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, tgt: Array, memory: Array, task_embed: Optional[Array] = None
    ) -> Array:
        emb = lambda x: x if task_embed is None else x + task_embed
        q = emb(tgt)
        attn = MultiheadAttention(
            self.d_model, self.nhead, dtype=self.dtype, name="self_attn"
        )(q, q, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt + attn)
        attn = MultiheadAttention(
            self.d_model, self.nhead, dtype=self.dtype, name="cross_attn"
        )(emb(tgt), memory, memory)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + attn)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(jax.nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt + y)


class Transformer(nn.Module):
    """The reference's generic encoder-decoder (eitr/transformer.py:8-34):
    the encoder output serves as BOTH decoder input and memory; positions
    feed every encoder layer, the task embedding every decoder layer."""

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, src: Array, pos: Optional[Array] = None,
        task_embed: Optional[Array] = None,
    ) -> Array:
        out = src
        for i in range(self.num_encoder_layers):
            out = GenericTransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                dtype=self.dtype, name=f"encoder_layers{i}",
            )(out, pos)
        memory = out
        for i in range(self.num_decoder_layers):
            out = GenericTransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                dtype=self.dtype, name=f"decoder_layers{i}",
            )(out, memory, task_embed)
        return out
