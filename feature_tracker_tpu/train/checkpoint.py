"""Checkpoint / resume for training state (Orbax-backed).

The reference has no checkpointing anywhere (SURVEY §5 — RAFT has no
training loop, no state_dict I/O); this subsystem is new scope required
for production training: save/restore of the full TrainState (params,
optimizer state, step) with retention, atomic finalize, and
restore-onto-sharded-state support so a resumed run keeps its mesh
placement.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            create=True)
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, state) -> bool:
        """Save state at step; returns True if a save actually happened
        (the manager skips off-interval steps)."""
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        return bool(saved)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_like, step: int | None = None):
        """Restore into the structure (and shardings) of ``state_like``.

        ``state_like`` provides the pytree layout plus the target
        placement: restoring onto a sharded template keeps arrays on
        their mesh devices. Returns the restored state."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self._dir}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                getattr(x, "shape", ()), getattr(x, "dtype", None),
                sharding=getattr(x, "sharding", None)),
            state_like)
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(abstract))

    def all_steps(self):
        return list(self._mgr.all_steps())

    def close(self):
        self._mgr.close()
