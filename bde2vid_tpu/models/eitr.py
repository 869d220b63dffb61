"""EITR: multi-level-scale transformer reconstruction (ET-Net-like).

Reference: model/eitr/{eitr.py:9-34, u_trans.py:14-115}. Head conv + three
recurrent strided encoders; the three scales are unified to 256-d token
streams at H/8 (identity / k2s2 conv / k4s4 conv), each run through a
3-layer pre-norm transformer encoder with a shared sine position table; three
2-layer decoders attend cross-scale (hc0: hs0->hs0, hc1: hs1->hs0,
hc2: hs2->hs1); the mean of all six streams is reshaped back to the H/8 grid
and decoded with skip-sum upsample convs; 1x1 pred + sigmoid. Input is
padded to /8 inside the model (reference eitr.py:22-34 CropSize).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bde2vid_tpu.models.api import register_model
from bde2vid_tpu.nn.layers import ConvLayer, UpsampleConvLayer
from bde2vid_tpu.nn.recurrent import RecurrentConvLayer, lstm_initial_state
from bde2vid_tpu.nn.transformer import (
    TransformerDecoder,
    TransformerEncoder,
    sine_position_table,
)
from bde2vid_tpu.utils.padding import CropParameters

Array = jax.Array


@register_model("EITR")
class EITR(nn.Module):
    config: Dict[str, Any]
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, voxel: Array, state) -> Tuple[Dict[str, Array], Any]:
        norm = self.config.get("norm", None)
        chans = tuple(self.config.get("channels", (32, 64, 128, 256)))
        d = int(self.config.get("d_model", 256))
        ff = int(self.config.get("dim_feedforward", d * 4))
        nhead = int(self.config.get("nhead", 8))
        n, H0, W0, _ = voxel.shape
        crop = CropParameters(W0, H0, 3)
        x = crop.pad(voxel)

        x = ConvLayer(
            chans[0], 5, padding=2, norm=norm, dtype=self.dtype, train=self.train,
            name="head",
        )(x)
        head = x

        blocks = []
        new_states = []
        for i, ch in enumerate(chans[1:]):
            x, st = RecurrentConvLayer(
                ch,
                kernel_size=5,
                stride=2,
                padding=2,
                norm=norm,
                dtype=self.dtype,
                train=self.train,
                name=f"DownsampleConv{i}",
            )(x, state[i])
            blocks.append(x)
            new_states.append(st)

        # --- token streams at H/8, d=256 -----------------------------------
        nb, h8, w8, _ = blocks[2].shape
        words0 = blocks[2].reshape(nb, h8 * w8, d)
        words1 = nn.Conv(
            d, (2, 2), strides=(2, 2), padding="VALID", dtype=self.dtype, name="split1"
        )(blocks[1]).reshape(nb, h8 * w8, d)
        words2 = nn.Conv(
            d, (4, 4), strides=(4, 4), padding="VALID", dtype=self.dtype, name="split2"
        )(blocks[0]).reshape(nb, h8 * w8, d)

        pos = jnp.asarray(sine_position_table(h8 * w8, d), words0.dtype)[None]

        enc = lambda name: TransformerEncoder(
            d, nhead, 3, ff, dtype=self.dtype, name=name
        )
        dec = lambda name: TransformerDecoder(
            d, nhead, 2, ff, dtype=self.dtype, name=name
        )
        hs0 = enc("trans_encoder0")(words0, pos)
        hs1 = enc("trans_encoder1")(words1, pos)
        hs2 = enc("trans_encoder2")(words2, pos)
        if self.config.get("use_trans_decoder", True):
            hc0 = dec("trans_decoder0")(tgt=hs0, memory=hs0)
            hc1 = dec("trans_decoder1")(tgt=hs1, memory=hs0)
            hc2 = dec("trans_decoder2")(tgt=hs2, memory=hs1)
            hs = (hs0 + hs1 + hs2 + hc0 + hc1 + hc2) / 6.0
        else:
            # encoder-only variant (reference mls_tpa_wo_transde,
            # u_trans.py:118-206)
            hs = (hs0 + hs1 + hs2) / 3.0
        hs = hs.reshape(nb, h8, w8, d)
        # --- conv decoder with skip sums ------------------------------------
        for i, ch in enumerate((chans[2], chans[1], chans[0])):
            hs = UpsampleConvLayer(
                ch,
                kernel_size=5,
                padding=2,
                norm=norm,
                dtype=self.dtype,
                train=self.train,
                name=f"UpsampleConv{i}",
            )(hs + blocks[2 - i])  # skip_sum with blocks[3-i-1] (u_trans:108)
        img = ConvLayer(
            1,
            1,
            padding=0,
            activation=None,
            norm=norm,
            dtype=self.dtype,
            train=self.train,
            name="pred",
        )(hs + head)  # skip_sum with the head feature (u_trans:111)
        img = jax.nn.sigmoid(img)
        return {"image": crop.crop(img)}, tuple(new_states)

    def initial_state(self, batch, height, width, dtype=None):
        """States live at the PADDED (/8) resolution."""
        dtype = dtype or self.dtype
        chans = tuple(self.config.get("channels", (32, 64, 128, 256)))
        crop = CropParameters(width, height, 3)
        h, w = crop.height_crop_size, crop.width_crop_size
        states = []
        for ch in chans[1:]:
            h, w = (h - 1) // 2 + 1, (w - 1) // 2 + 1
            states.append(lstm_initial_state(batch, h, w, ch, dtype))
        return tuple(states)
