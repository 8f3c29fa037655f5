"""Persistent XLA compile cache env setup.

Measured on the deployed remote-TPU plugin (r3): the on-disk cache
persists only small host-side programs (~200 entries) — the big TPU
train-step executables are NOT serialized by this plugin, so cold-start
compiles still happen per process; fast repeats (observed: 35 min cold →
~2 min) come from SERVER-side compile caching keyed on the program, which
needs identical shapes/program, not this env. Harmless either way, and
on CPU (tests) it is the real win — kept enabled everywhere.

Import (or call ``enable()``) before jax triggers its first compile.
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
