"""Training checkpoints via Orbax: per-epoch save, best-RMSE tracking,
resume with optimizer state and step counter.

Capability parity with reference utils/util.py:
  * save_model — {epoch, model, optimizer} every epoch (ref :20-27);
  * save_model_best_rmse_model — keep `best` by validation RMSE (ref :51-65);
  * load_model — restore params+optimizer, return epoch so the LR schedule
    continues (ref :29-49, train.py:119-135). Our TrainState carries the
    step counter directly, so resume is exact rather than recomputed.

Orbax gives atomic multi-host-safe writes — the failure-recovery capability
the reference lacks (SURVEY.md §5.3).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None
             ) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_epoch(ckpt_dir: str, state, epoch: int,
               max_to_keep: Optional[int] = None) -> None:
    """Save the full TrainState under the epoch number."""
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(epoch, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(ckpt_dir: str, state_template, epoch: Optional[int] = None
            ) -> Tuple[Any, int]:
    """Restore a TrainState (template provides structure/shapes). Returns
    (state, epoch). epoch=None -> latest."""
    mgr = _manager(ckpt_dir)
    if epoch is None:
        epoch = mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    state = mgr.restore(epoch, args=ocp.args.StandardRestore(state_template))
    mgr.close()
    return state, epoch


class BestTracker:
    """Keep the best-RMSE checkpoint (ref utils/util.py:51-65)."""

    def __init__(self, ckpt_dir: str, metric: str = "rmse",
                 initial: float = 1e9):
        self.dir = os.path.join(ckpt_dir, "best")
        self.metric = metric
        self.best = initial

    def update(self, state, epoch: int, value: float) -> bool:
        if value >= self.best:
            return False
        self.best = value
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(os.path.abspath(self.dir), f"epoch_{epoch}")
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        # prune older best dirs
        if os.path.isdir(self.dir):
            for d in sorted(os.listdir(self.dir)):
                if d != f"epoch_{epoch}":
                    import shutil
                    shutil.rmtree(os.path.join(self.dir, d),
                                  ignore_errors=True)
        return True
