"""Multi-host orchestration: jax.distributed bootstrap + per-host data
ownership.

No reference counterpart (the reference is single-process, SURVEY §2.4).
Usage on each host of a pod slice:

    from ebnerd_tpu.parallel import distributed as dist
    dist.initialize()                      # env-driven (TPU pods: automatic)
    mesh = make_mesh()                     # global devices
    rows = host_shard_rows(len(df))        # this host's slice of the data
    feed = NewsrecFeed(df.take_slice(rows), ...)

Gradient reduction over hosts rides the same jit-inserted psum as
single-host DP — the mesh spans all processes' devices.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize", "is_distributed", "process_info", "local_device_slice"]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env fallbacks; idempotent and a
    no-op for single-process runs with no coordinator configured."""
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get("EBNERD_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        # TPU pod runtimes auto-discover; bare single-host runs skip.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            try:
                jax.distributed.initialize()
                _initialized = True
            except Exception:
                pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def local_device_slice(n_rows: int) -> slice:
    """Rows of a global dataset owned by this host (contiguous blocks)."""
    from .mesh import host_shard_rows

    return host_shard_rows(n_rows)
