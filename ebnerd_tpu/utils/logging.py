"""Training observability: scalar logging + step profiling.

Counterpart of the reference's TensorBoard wiring (reference: Keras
TensorBoard callback, examples/reproducibility_scripts/ebnerd_nrms.py:
212-215; torch SummaryWriter scalars, src/ebrec/models/fastformer/
dataloader.py:150,191-196,216-230). Scalars always go to a JSONL file
(greppable, dependency-free); a TensorBoard event file is written too
when a SummaryWriter implementation is importable.
"""
from __future__ import annotations

import json
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Optional

__all__ = ["ScalarLogger", "StepTimer", "trace_profile"]


class ScalarLogger:
    """Append-only scalar sink: JSONL always, TensorBoard when available."""

    def __init__(self, log_dir, tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "scalars.jsonl", "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir))
            except Exception:
                self._tb = None

    def log(self, tag: str, value: float, step: int) -> None:
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step),
                        "ts": time.time()}) + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def log_dict(self, scalars: dict, step: int) -> None:
        for tag, value in scalars.items():
            if isinstance(value, (int, float)):
                self.log(tag, value, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class StepTimer:
    """Wall-clock step timing with device sync — impressions/sec the way
    the bench measures it (``jax.block_until_ready`` before reading the
    clock)."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.history: list[float] = []

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            import jax

            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.history.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.history) / max(len(self.history), 1)


@contextmanager
def trace_profile(log_dir, enabled: bool = True):
    """JAX profiler trace context — open the output with TensorBoard's
    profile plugin or Perfetto (the TPU answer to the reference's
    TensorBoard histogram_freq profiling)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
