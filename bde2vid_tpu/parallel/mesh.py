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


def get_shard_map():
    """Version-compat shim: returns ``(shard_map, rep_kw)``.

    jax >= 0.4.35 exposes ``jax.shard_map`` with the replication check
    spelled ``check_vma``; older pins keep ``jax.experimental.shard_map``
    with ``check_rep``. One shared helper so sharded_eval/sharded_train
    cannot drift apart when the pin moves.
    """
    try:
        from jax import shard_map  # stable API

        return shard_map, {"check_vma": False}
    except ImportError:  # older pins keep the experimental module
        from jax.experimental.shard_map import shard_map

        return shard_map, {"check_rep": False}


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    need = n_data * n_spatial
    if need <= 0 or len(devices) < need:
        raise ValueError(
            f"make_mesh needs {n_data}x{n_spatial}={need} devices, found "
            f"{len(devices)} ({[d.platform for d in devices[:4]]}...). Hint: "
            "a virtual CPU mesh requires forcing the CPU platform "
            "(jax.config.update('jax_platforms', 'cpu')) AND setting "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N before the "
            "backend initializes; see __graft_entry__._provision_virtual_mesh."
        )
    arr = np.asarray(devices[:need]).reshape(n_data, n_spatial)
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
