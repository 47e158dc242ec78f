"""Orbax-backed checkpointing with the reference's session-dir layout.

Replaces tf.train.Checkpoint/CheckpointManager (`train_autoregressive.py:114-133`)
and torch state_dict save/restore (`fatchord_version.py:385-408`): saves
(params, opt_state, batch_stats, step) pytrees; per-model managers so each
MINE net checkpoints independently, as the reference does.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory, max_to_keep: Optional[int] = None,
                 keep_period: Optional[int] = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               keep_period=keep_period,
                                               create=True)
        self._mngr = ocp.CheckpointManager(str(self.directory), options=options)

    def save(self, step: int, tree: Any):
        self._mngr.save(step, args=ocp.args.StandardSave(tree))
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, tree_like: Any, step: Optional[int] = None):
        """Restore into the structure of ``tree_like``; returns (tree, step)
        or (tree_like, None) when no checkpoint exists."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return tree_like, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree_like)
        restored = self._mngr.restore(step,
                                      args=ocp.args.StandardRestore(abstract))
        return restored, step

    def close(self):
        self._mngr.close()
