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
    "put_replicated",
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
    """Ship a host batch to devices, splitting the batch axis over 'data'.

    Single-process: one device_put per array. Multi-process (the mesh
    spans hosts): every process passes the same GLOBAL batch; each host
    extracts its contiguous row slice and the global jax.Array is
    assembled from the process-local shards — the multi-controller
    equivalent of the same sharding."""
    if mesh is None:
        return batch
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        out = {}
        for k, v in batch.items():
            if getattr(v, "ndim", 0) >= 1:
                rows = host_shard_rows(v.shape[0])
                out[k] = jax.make_array_from_process_local_data(
                    sharding, np.ascontiguousarray(np.asarray(v)[rows]),
                    global_shape=np.asarray(v).shape)
            else:
                out[k] = v
        return out
    return {
        k: (jax.device_put(v, sharding) if getattr(v, "ndim", 0) >= 1 else v)
        for k, v in batch.items()
    }


def put_replicated(x, mesh: Mesh):
    """Replicate a host array over every device of the mesh; works in both
    single- and multi-controller runs (all processes must pass the same
    value)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            replicated(mesh), np.asarray(x), global_shape=np.asarray(x).shape)
    return jax.device_put(x, replicated(mesh))


def host_shard_rows(n_rows: int, process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> slice:
    """Contiguous row range owned by this host in a multi-host run (each
    process feeds only its slice of the global batch)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_rows // pc)
    return slice(pi * per, min((pi + 1) * per, n_rows))
