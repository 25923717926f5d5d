"""Training checkpoint/resume on orbax.

Role parity with the reference recipes' Lightning ``ModelCheckpoint``
(SURVEY.md §5; examples/asr/emformer_rnnt/train.py:16-32 keeps top-k +
auto-resume): a thin `CheckpointManager` wrapper that saves the full train
state pytree (params, opt_state, step) atomically, keeps the most recent
``max_to_keep``, and restores the latest on resume.  Works on multi-host
meshes: orbax writes each shard from its owning host.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["CheckpointManager", "save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


class CheckpointManager:
    """Keep the ``max_to_keep`` most recent train states under ``directory``.

    >>> mgr = CheckpointManager("ckpts", max_to_keep=3)
    >>> mgr.save(step, {"params": params, "opt_state": opt_state})
    >>> state = mgr.restore()                  # latest, or None if empty
    >>> state = mgr.restore(step=100)          # specific step
    """

    def __init__(self, directory: str, max_to_keep: int = 5):
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        import orbax.checkpoint as ocp

        ok = self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()
        return ok

    def restore(self, step: Optional[int] = None, *, like: Any = None) -> Any:
        """Restore a saved state. ``like`` (optional) gives the target pytree
        structure/shardings so arrays restore onto the right devices."""
        import orbax.checkpoint as ocp

        if step is None:
            step = self.latest_step()
            if step is None:
                return None
        args = ocp.args.StandardRestore(like) if like is not None else ocp.args.StandardRestore()
        return self._mgr.restore(step, args=args)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return list(self._mgr.all_steps())

    def close(self):
        self._mgr.close()


def save_checkpoint(directory: str, step: int, state: Any, max_to_keep: int = 5) -> None:
    """One-shot save (constructs a manager per call; prefer CheckpointManager in loops)."""
    mgr = CheckpointManager(directory, max_to_keep)
    try:
        mgr.save(step, state)
    finally:
        mgr.close()


def restore_checkpoint(directory: str, step: Optional[int] = None, like: Any = None) -> Any:
    """Restore the latest (or a specific) checkpoint; None if none exist."""
    mgr = CheckpointManager(directory)
    try:
        return mgr.restore(step, like=like)
    finally:
        mgr.close()


def latest_step(directory: str) -> Optional[int]:
    mgr = CheckpointManager(directory)
    try:
        return mgr.latest_step()
    finally:
        mgr.close()
