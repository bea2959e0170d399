"""1-D data-parallel mesh helpers built on jax.sharding."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_parallel_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices, axis name 'data'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (DATA_AXIS,))


def shard_spec(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, schedule arrays, stats)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device_put every batch array with its leading dim split over the mesh.

    Batch sizes must divide the mesh size; the data layer's `batches()`
    iterator drops remainders so shapes stay static.
    """
    s = shard_spec(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}
