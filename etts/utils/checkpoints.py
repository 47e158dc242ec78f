"""Orbax-backed checkpointing with the reference's session-dir layout.

Replaces tf.train.Checkpoint/CheckpointManager (`train_autoregressive.py:114-133`)
and torch state_dict save/restore (`fatchord_version.py:385-408`).

Canonical checkpoint layout (one per step dir):
  {"params": ..., "opt_state": ..., "batch_stats": ..., "step": int32}
Inference-side consumers restore partially ({"params", "batch_stats",
"step"}) so they never need to reconstruct the optimizer pytree.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "state_to_tree", "tree_to_state"]


def state_to_tree(state) -> dict:
    """TrainState -> canonical checkpoint dict."""
    return {"params": state.params, "opt_state": state.opt_state,
            "batch_stats": state.batch_stats, "step": state.step}


def tree_to_state(tree: dict, state):
    """Canonical dict -> TrainState (template provides the class)."""
    return state.replace(params=tree["params"], opt_state=tree["opt_state"],
                         batch_stats=tree["batch_stats"], step=tree["step"])


class CheckpointManager:
    def __init__(self, directory, max_to_keep: Optional[int] = None,
                 keep_period: Optional[int] = None,
                 keep_every_n_hours: Optional[float] = None):
        """``keep_every_n_hours`` is the reference's time-based retention
        (tf.train.CheckpointManager ``keep_checkpoint_every_n_hours``,
        `TransformerTTS/train_forward.py:105-111`) on top of the step-based
        ``keep_period``."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        keep_time = None
        if keep_every_n_hours is not None:
            import datetime
            keep_time = datetime.timedelta(hours=float(keep_every_n_hours))
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               keep_period=keep_period,
                                               keep_time_interval=keep_time,
                                               create=True)
        self._mngr = ocp.CheckpointManager(str(self.directory), options=options)

    def save(self, step: int, tree: Any):
        self._mngr.save(step, args=ocp.args.PyTreeSave(jax.device_get(tree)))
        self._mngr.wait_until_finished()

    def save_state(self, step: int, state):
        self.save(step, state_to_tree(state))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, tree_like: Any, step: Optional[int] = None,
                partial: bool = False):
        """Restore into the structure of ``tree_like``; returns (tree, step)
        or (tree_like, None) when no checkpoint exists. ``partial=True``
        restores a sub-tree of what was saved (e.g. params without
        opt_state)."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return tree_like, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree_like)
        restored = self._mngr.restore(
            step, args=ocp.args.PyTreeRestore(item=abstract,
                                              partial_restore=partial))
        return restored, step

    def restore_state(self, state, step: Optional[int] = None):
        """Restore a full TrainState; returns (state, step|None)."""
        tree, rstep = self.restore(state_to_tree(state), step)
        if rstep is None:
            return state, None
        return tree_to_state(tree, state), rstep

    def close(self):
        self._mngr.close()
