"""Serving: ahead-of-time exported model artifacts (jax.export / StableHLO).

The reference has no deployment story — serving a model means carrying the
whole PyTorch source tree plus a checkpoint and re-instantiating the module
graph at load time (eval_models_seq.py:41-96). The TPU-native answer is an
AOT artifact: ``jax.export`` serializes the jitted forward (StableHLO body,
calling convention, platform checks) so a server process can run the model
with only jax installed — no model source, no torch, no checkpoint parsing.

One :class:`ServingBundle` (a zip file) holds the exported functions
(``forward`` for sequence models; ``step`` + ``init_state`` for streaming
recurrent models), and JSON metadata (model name/config, input specs,
platforms, jax version).
"""

from bde2vid_tpu.serving.export import (
    ServingBundle,
    export_forward,
    export_spec_bundle,
    load_bundle,
    run_voxels,
    save_bundle,
    serving_mesh,
)

__all__ = [
    "ServingBundle",
    "export_forward",
    "export_spec_bundle",
    "load_bundle",
    "run_voxels",
    "save_bundle",
    "serving_mesh",
]
