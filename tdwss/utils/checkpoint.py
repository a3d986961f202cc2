"""Epoch-numbered checkpointing with auto-resume (orbax).

Capability parity with ``scn.checkpoint_save`` / ``scn.checkpoint_restore``
as used by the reference drivers (train.py:37,91): save the full training
state under the experiment path every epoch, scan for the latest on startup,
and resume from it (returning the epoch to continue from).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, state: Any) -> None:
        self._mngr.save(epoch, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def restore_latest(self, template: Any) -> Tuple[Any, int]:
        """Returns (state, next_epoch); (template, start_epoch=1) if none."""
        step = self._mngr.latest_step()
        if step is None:
            return template, 1
        state = self._mngr.restore(step, args=ocp.args.StandardRestore(template))
        return state, step + 1

    @property
    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self) -> None:
        self._mngr.close()


def load_pretrain(path: str, state: Any) -> Any:
    """Seed ``state``'s params + batch_stats from a checkpoint directory.

    ``path`` is a Checkpointer directory (any epoch count); the latest
    epoch's params and batch_stats replace the fresh init while the
    optimizer state and step counter stay fresh — the --pretrain semantics
    (finetune), as opposed to auto-resume (continue).
    """
    mngr = ocp.CheckpointManager(os.path.abspath(path))
    try:
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {path}")
        restored = mngr.restore(step, args=ocp.args.StandardRestore(state))
    finally:
        mngr.close()
    return state.replace(params=restored.params,
                         batch_stats=restored.batch_stats)
