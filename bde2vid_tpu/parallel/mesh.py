"""Mesh + sharding helpers.

Design (TPU-first, per the scaling-book recipe): pick a mesh, annotate
shardings on the data, let XLA insert collectives.

- ``data`` axis: independent sequences (eval) or the batch (training) —
  embarrassingly parallel in the reference's protocol since chunk state
  resets make subsequences independent (eval_models_seq.py:216-219).
- ``spatial`` axis: shards the sensor-height dimension of the conv grid for
  large sensors — the meaningful "context parallelism" analog here (the
  temporal axis is handled by scan-chunking, not sharding).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data * n_spatial != len(devices):
        devices = devices[: n_data * n_spatial]
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard axis ``batch_axis`` over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def spatial_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0, h_axis: int = 2):
    """Shard batch over 'data' and the height axis over 'spatial'."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    spec[h_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """device_put a pytree with its leading axis sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim, batch_axis)), tree
    )
