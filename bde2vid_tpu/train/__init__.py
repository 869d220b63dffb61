"""Training path: sequence losses, train step factory, checkpointing.

The reference has no in-repo training loop; its training-mode plumbing lives
inside the BDE2VID model (mode='loss', V5:210-241) and the pytorch-template
config system. Here training is first-class: a functional sequence loss
matching the V5 in-loop computation, a jittable/shardable train step, and
msgpack checkpoints.
"""

from bde2vid_tpu.train.optim import build_optimizer, build_schedule
from bde2vid_tpu.train.trainer import (
    SequenceLossComputer,
    make_train_step,
    save_checkpoint,
    load_checkpoint,
    save_checkpoint_orbax,
    load_checkpoint_orbax,
    save_train_state_orbax,
    restore_train_state_orbax,
    is_train_state,
)

__all__ = [
    "build_optimizer",
    "build_schedule",
    "SequenceLossComputer",
    "make_train_step",
    "save_checkpoint",
    "load_checkpoint",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "save_train_state_orbax",
    "restore_train_state_orbax",
    "is_train_state",
]
