"""Orbax checkpointing of the full TrainState.

Exceeds the reference's recovery story (weights-only Keras
ModelCheckpoint + torch.save(state_dict), reference:
examples/reproducibility_scripts/ebnerd_nrms.py:222-229 and
src/ebrec/utils/_torch.py:9-13): the complete TrainState — params,
batch_stats, optimizer state, step counter — round-trips, so training
resumes exactly where it stopped instead of restarting from scratch.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "CheckpointManager"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(state, directory, step: Optional[int] = None, force: bool = True) -> Path:
    """Write the TrainState pytree under ``directory/step_<n>`` (or
    ``directory/best`` when step is None)."""
    directory = Path(directory).resolve()
    name = "best" if step is None else f"step_{step}"
    path = directory / name
    ckpt = _checkpointer()
    ckpt.save(path, state, force=force)
    ckpt.wait_until_finished()
    return path


def restore_checkpoint(target, directory, step: Optional[int] = None):
    """Restore into the structure of ``target`` (an abstract or concrete
    TrainState with the right shapes/shardings)."""
    directory = Path(directory).resolve()
    name = "best" if step is None else f"step_{step}"
    return _checkpointer().restore(directory / name, target)


def latest_step(directory) -> Optional[int]:
    """Largest step_<n> checkpoint present, or None."""
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = []
    for p in directory.iterdir():
        if p.name.startswith("step_"):
            try:
                steps.append(int(p.name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


class CheckpointManager:
    """Best-metric gating + periodic checkpoints for a Trainer.

    Mirrors the reference's ModelCheckpoint(save_best_only) semantics on
    top of full-state saves; ``keep`` bounds how many step checkpoints
    stay on disk.
    """

    def __init__(self, directory, keep: int = 3):
        self.directory = Path(directory)
        self.keep = keep
        self._saved_steps: list[int] = []

    def save_step(self, state, step: int) -> Path:
        path = save_checkpoint(state, self.directory, step=step)
        self._saved_steps.append(step)
        while len(self._saved_steps) > self.keep:
            old = self._saved_steps.pop(0)
            self._remove(f"step_{old}")
        return path

    def save_best(self, state) -> Path:
        return save_checkpoint(state, self.directory, step=None)

    def restore_best(self, target):
        return restore_checkpoint(target, self.directory, step=None)

    def restore_latest(self, target):
        step = latest_step(self.directory)
        if step is None:
            return None, None
        return restore_checkpoint(target, self.directory, step=step), step

    def _remove(self, name: str) -> None:
        import shutil

        path = self.directory / name
        if path.exists():
            shutil.rmtree(path)
