"""Parallelism layer: mesh construction + sharding policies.

The reference is strictly single-device (SURVEY.md §2.5: no torch.distributed
anywhere); capacity comes from CPU offload and chunking. Here parallel scale
is first-class: a ``jax.sharding.Mesh`` with ``data`` (sequences/batch) and
``spatial`` (sensor rows) axes, sharding constraints on the voxel/feature
tensors, and XLA-inserted collectives over ICI.
"""

from bde2vid_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicate,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate",
    "shard_batch",
    "make_dp_train_step",
]


def __getattr__(name):  # lazy: sharded_train pulls in optax/trainer
    if name == "make_dp_train_step":
        from bde2vid_tpu.parallel.sharded_train import make_dp_train_step

        return make_dp_train_step
    raise AttributeError(name)
