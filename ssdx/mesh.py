"""Device mesh + sharding utilities (the parallelism layer).

The reference is single-device (SURVEY §2.2): its only parallelism is
DataLoader worker processes.  Here data parallelism is first-class: a 1-D
``jax.sharding.Mesh`` over all local devices with a ``data`` axis; batches are
sharded on their leading axis, parameters/optimizer state are replicated, and
XLA inserts the gradient ``psum`` (riding ICI on a real slice) automatically
when the jitted train step is compiled with these shardings.

BatchNorm note: with the batch sharded and parameters replicated, the batch
statistics are global means over the full logical batch — XLA lowers the mean
to cross-replica collectives, i.e. sync-BN semantics at no extra code.

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``); the mesh then spans all processes and DCN.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "initialize_distributed",
]

DATA_AXIS = "data"


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (DCN); no-op for single-process runs."""
    if jax.process_count() == 1 and not kwargs:
        return
    jax.distributed.initialize(**kwargs)


def create_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state, priors)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put every leaf of a batch pytree with its leading axis sharded
    over the data mesh axis (the host->device transfer of the input pipeline)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
