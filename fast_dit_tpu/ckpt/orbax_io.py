"""Native checkpointing via orbax, replacing the reference's rank-0
`torch.save({"model","ema","opt","args"})` every 50k steps
(`/root/reference/train.py:229-239`).

Orbax writes sharded, async-capable checkpoints directly from device arrays
(no host gather), and restore works under any mesh. The saved tree keeps the
reference's logical layout: {"params", "ema", "opt_state", "step", "args"}.
A torch-compatible `.pt` export lives in `torch_import.flax_to_state_dict`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_checkpoint", "restore_checkpoint"]


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with step retention."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, tree: Any, *, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(tree), force=force)

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_checkpoint(directory: str, step: int, tree: Any):
    mgr = CheckpointManager(directory)
    mgr.save(step, tree, force=True)
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, step: Optional[int] = None, template: Any = None) -> Any:
    mgr = CheckpointManager(directory)
    try:
        return mgr.restore(step, template)
    finally:
        mgr.close()
