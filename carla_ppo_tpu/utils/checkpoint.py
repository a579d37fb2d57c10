"""Orbax checkpointing of whole train-state pytrees.

Replaces the reference's tf.train.Saver flows (reference: ppo.py:183-216,
vae/models.py:153-186): checkpoints keyed by a step counter, `save()` +
`load_latest_checkpoint()` semantics, resume continues counters transparently
because the counters live inside the saved pytree (the reference keeps them
as graph variables for the same reason, ppo.py:101-103).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, checkpoint_dir: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(checkpoint_dir)
        os.makedirs(self.directory, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, tree: Any) -> None:
        self._manager.save(step, args=ocp.args.StandardSave(tree))
        self._manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore_latest(self, template: Any) -> Optional[Any]:
        """Restore the newest checkpoint into `template`'s structure, or None
        (the reference returns False when nothing restores, ppo.py:207-216)."""
        step = self._manager.latest_step()
        if step is None:
            return None
        return self._manager.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def restore(self, step: int, template: Any) -> Any:
        return self._manager.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def close(self) -> None:
        self._manager.close()
