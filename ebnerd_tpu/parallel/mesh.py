"""Device mesh + sharding helpers.

This layer has no reference counterpart — the reference is single-process,
single-device (SURVEY §2.4; no tf.distribute / torch.distributed anywhere).
Here parallelism is expressed the XLA way: a ``jax.sharding.Mesh`` with
named axes, ``NamedSharding`` annotations on batches/params, and jit-driven
collective insertion (psum over the ``data`` axis for gradients,
all-gather/all-to-all for row-sharded tables over ``model``).

Axes:
  data  — batch/data parallelism (gradient psum rides ICI)
  model — row-sharding of large value tables (word embeddings, docvecs)
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "table_sharding",
    "shard_batch",
    "host_shard_rows",
]


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over the available devices with (data, model) axes. With no
    arguments, all devices go to the data axis."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data}*{model} != {n} devices")
    return Mesh(devs.reshape(data, model), axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading axis split over 'data', replicated over 'model'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Value tables ([V+1, ...]) row-sharded over the 'model' axis; XLA
    turns the in-graph gather into an all-gather/dynamic-slice exchange."""
    return NamedSharding(mesh, P("model"))


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Ship a host batch to devices, splitting the batch axis over 'data'."""
    if mesh is None:
        return batch
    sharding = data_sharding(mesh)
    return {
        k: (jax.device_put(v, sharding) if getattr(v, "ndim", 0) >= 1 else v)
        for k, v in batch.items()
    }


def host_shard_rows(n_rows: int, process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> slice:
    """Contiguous row range owned by this host in a multi-host run (each
    process feeds only its slice of the global batch)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_rows // pc)
    return slice(pi * per, min((pi + 1) * per, n_rows))
