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


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS,
                batch_dim: int = 0) -> Any:
    """device_put every array leaf with its batch dim split over the mesh.
    ``batch_dim=1`` handles stacked multi-step megabatches (G, B, ...)."""
    spec = P(axis) if batch_dim == 0 else P(*([None] * batch_dim + [axis]))
    sharding = NamedSharding(mesh, spec)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


class DevicePrefetcher:
    """Background host->device transfer pipeline.

    Pulls host batches from an iterator factory, applies ``prepare`` (e.g.
    text encoding) and ships the result to the mesh on a worker thread so
    transfers overlap the previous step's compute. Matters doubly on remote
    TPU backends where device_put blocks while the device is busy."""

    def __init__(self, batch_iter_fn, prepare_fn, mesh: Mesh, depth: int = 2,
                 batch_dim: int = 0):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._mesh = mesh
        self._stop = threading.Event()

        def worker():
            try:
                for batch in batch_iter_fn():
                    item = shard_batch(prepare_fn(batch), mesh, batch_dim=batch_dim)
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
                self._q.put(None)
            except BaseException as e:
                self._q.put(e)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker and drain (prevents a blocked daemon thread from
        crashing interpreter teardown)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
