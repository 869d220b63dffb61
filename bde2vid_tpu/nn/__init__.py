"""Neural-net building blocks (flax.linen, NHWC, TPU-first).

Conventions:
- Data layout is NHWC (TPU-native); the reference is NCHW. The checkpoint
  converter handles the transpose once at load time.
- Convolutions use explicit torch-style symmetric padding tuples, NOT XLA
  "SAME" — for stride-2 / even-size inputs the two disagree on alignment and
  parity with reference checkpoints requires torch alignment.
- Recurrent cells are pure ``(x, state) -> (y, state)`` functions of params;
  no hidden module state. Models thread state through ``lax.scan``.
- Modules take ``dtype`` (compute dtype, e.g. bfloat16) and keep params in
  float32 by default.
"""

from bde2vid_tpu.nn.layers import (
    ConvLayer,
    TransposedConvLayer,
    UpsampleConvLayer,
    PixelShufflePack,
    ResidualBlock,
    get_activation,
    skip_sum,
    skip_concat,
)
from bde2vid_tpu.nn.recurrent import (
    ConvLSTMCell,
    ConvGRUCell,
    RecurrentConvLayer,
    RecurrentResidualLayer,
)

__all__ = [
    "ConvLayer",
    "TransposedConvLayer",
    "UpsampleConvLayer",
    "PixelShufflePack",
    "ResidualBlock",
    "get_activation",
    "skip_sum",
    "skip_concat",
    "ConvLSTMCell",
    "ConvGRUCell",
    "RecurrentConvLayer",
    "RecurrentResidualLayer",
]
