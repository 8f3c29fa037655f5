"""Persistent XLA compile cache (verified honored by the deployed
remote-TPU PJRT plugin: bench.py's .jax_cache fills on first run and
repeat runs skip the 5-25 min cold compiles).

Import (or call ``enable()``) BEFORE the first ``import jax`` takes
effect on backend initialization — module import order is enough because
the env vars are read lazily at first compile.
"""
from __future__ import annotations

import os
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent.parent


def enable(cache_dir: str | os.PathLike | None = None) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(cache_dir or _REPO / ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


enable()
