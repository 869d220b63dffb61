"""Model zoo: the five reconstruction families on one functional protocol.

Every model is a flax module whose ``__call__`` takes
``(voxel_NHWC, state) -> (out_dict, state)`` for per-step (unidirectional)
models, or ``voxels_TNHWC -> images`` for sequence-level models (BDE2VID).
State is an explicit pytree; ``initial_state`` builds zeros. The shared
sequence runner (api.run_sequence) is a single ``lax.scan`` with donated
carries — the TPU replacement for the reference's hidden-attribute state +
per-step Python loop.
"""

from bde2vid_tpu.models.api import run_sequence, ModelSpec, build_model, MODEL_REGISTRY
from bde2vid_tpu.models.unet import UNet, UNetRecurrent, UNetFire, UNetFlow
from bde2vid_tpu.models.e2vid import E2VID, E2VIDRecurrent, FireNet, FireNetOrg, FlowNet
from bde2vid_tpu.models.spade_e2vid import SPADEE2VID
from bde2vid_tpu.models.evsnn import EVSNN, PAEVSNN
from bde2vid_tpu.models.eitr import EITR
from bde2vid_tpu.models.bde2vid import BDE2VID, BDE2VIDGenerator

__all__ = [
    "run_sequence",
    "ModelSpec",
    "build_model",
    "MODEL_REGISTRY",
    "UNet",
    "UNetRecurrent",
    "UNetFire",
    "UNetFlow",
    "E2VID",
    "E2VIDRecurrent",
    "FireNet",
    "FireNetOrg",
    "FlowNet",
    "SPADEE2VID",
    "EVSNN",
    "PAEVSNN",
    "EITR",
    "BDE2VID",
    "BDE2VIDGenerator",
]
