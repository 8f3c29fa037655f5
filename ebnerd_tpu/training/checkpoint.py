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


def reshard_like(target, restored):
    """Re-place restored leaves under the target's shardings (mesh runs
    only). Orbax brings leaves back COMMITTED to concrete devices; for a
    mesh-placed state that leaves e.g. the scalar step counter pinned to
    one device while params span the mesh, which jit rejects as
    incompatible devices. Mesh-sharded targets get a device_put to their
    NamedSharding; targets that were uncommitted (the fresh ``jnp.zeros``
    step) have the committed placement dropped via a host round-trip
    (cheap — only such leaves are scalars/counters)."""
    import numpy as np
    from jax.sharding import NamedSharding

    leaves = jax.tree_util.tree_leaves(target)
    if not any(isinstance(getattr(l, "sharding", None), NamedSharding)
               for l in leaves):
        return restored  # single-device run: no placement conflicts

    def fix(tgt, leaf):
        tgt_sharding = getattr(tgt, "sharding", None)
        if isinstance(tgt_sharding, NamedSharding):
            if (hasattr(leaf, "sharding") and leaf.sharding != tgt_sharding
                    and getattr(leaf, "is_fully_addressable", True)):
                return jax.device_put(leaf, tgt_sharding)
            return leaf
        if hasattr(leaf, "sharding") and getattr(leaf, "is_fully_addressable", True):
            import jax.numpy as jnp

            return jnp.asarray(np.asarray(leaf))
        return leaf

    return jax.tree_util.tree_map(fix, target, restored)


def restore_checkpoint(target, directory, step: Optional[int] = None):
    """Restore into the structure of ``target`` (an abstract or concrete
    TrainState with the right shapes/shardings); leaves are re-placed
    under the target's shardings (see ``reshard_like``)."""
    directory = Path(directory).resolve()
    name = "best" if step is None else f"step_{step}"
    restored = _checkpointer().restore(directory / name, target)
    return reshard_like(target, restored)


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
        # seed from step_<n> dirs already on disk so the keep-bound spans
        # resumed runs (a fresh manager would otherwise never prune the
        # previous process's checkpoints)
        self._saved_steps: list[int] = []
        if self.directory.exists():
            for p in sorted(self.directory.iterdir()):
                if p.name.startswith("step_"):
                    try:
                        self._saved_steps.append(int(p.name.split("_", 1)[1]))
                    except ValueError:
                        pass
            self._saved_steps.sort()

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
