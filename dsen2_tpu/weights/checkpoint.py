"""Full training-state checkpointing via orbax.

The reference checkpoints weights only; `--resume` restores weights and the
optimizer restarts cold (training/supres_train.py:181-185, SURVEY.md §5.4).
Here the complete state — params, Nadam moments/momentum schedule, epoch,
plateau-scheduler state — round-trips, so resume continues the exact
trajectory. Keras-HDF5 export (weights/keras_h5.py) remains the
interchange format for the reference's tooling."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

__all__ = ["save_train_state", "restore_train_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, params: Dict, opt_state: Any, epoch: int,
                     extra: Optional[Dict] = None) -> None:
    """Save a complete training state to `path` (a directory).

    Crash-safe against overwrites: orbax with force=True deletes the target
    before writing, so saving straight onto the previous checkpoint would
    leave NO valid state if the process dies mid-save. Instead the new state
    is fully written to a sibling .tmp dir first and swapped in with two
    renames; a stale .old from a crash inside the swap window is kept for
    restore_train_state's fallback."""
    import shutil

    state = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
        "epoch": np.asarray(epoch),
        "extra": jax.tree_util.tree_map(np.asarray, extra or {}),
    }
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    _checkpointer().save(tmp, state, force=True)
    # A stale .old may be the ONLY valid state (crash after the previous
    # save's path->old rename): never delete it while `path` is absent.
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def restore_train_state(path: str, like: Optional[Dict] = None) -> Dict:
    """Restore {'params', 'opt_state', 'epoch', 'extra'} from `path`.
    Pass `like` (a matching state pytree) to restore typed/structured
    leaves; without it orbax returns the raw stored tree. Falls back to
    `path`.old when `path` is absent (crash inside save_train_state's
    rename window)."""
    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".old"):
        path = path + ".old"
    ckpt = _checkpointer()
    if like is not None:
        return ckpt.restore(path, item=like)
    return ckpt.restore(path)
