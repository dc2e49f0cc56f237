"""Device mesh + data-parallel sharding helpers.

Replaces the reference's DDP/NCCL stack (reference: train_ddp.py:27-65)
with jit-over-a-Mesh GSPMD: the batch is sharded over a 1-D ``data`` axis,
parameters are replicated, and XLA inserts the gradient all-reduce over ICI
automatically (the DDP all-reduce equivalent). BatchNorm statistics are
computed over the *global* batch by the same mechanism — SyncBatchNorm for
free (reference: train_ddp.py:63).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def create_mesh_for_batch(batch_size: int, axis: str = DATA_AXIS) -> Mesh:
    """Mesh over the largest device prefix that evenly divides the batch
    (a 2-sample debug batch on an 8-device host uses 2 devices)."""
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return Mesh(np.asarray(devices[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-dim (batch) sharding for input arrays."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """device_put every array leaf with its batch dim split over the mesh."""
    sharding = batch_sharding(mesh, axis)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
