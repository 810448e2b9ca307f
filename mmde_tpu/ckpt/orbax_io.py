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


def restore_eval(ckpt_dir: str, state_template, epoch: Optional[int] = None,
                 prefer_best: bool = True) -> Tuple[Any, int, str]:
    """Restore params/batch_stats/step ONLY, for evaluation.

    Evaluation does not carry optimizer state, so the eval-side TrainState
    holds optax.identity()'s EmptyState — a StandardRestore against a
    checkpoint saved by training (real AdamW opt_state) fails on the
    structure mismatch (round-5 convergence gate caught this). This
    restores the raw on-disk pytree with no template and merges only the
    leaves eval needs. When `prefer_best` and `epoch` is None, the
    best-RMSE checkpoint (ckpt_dir/best/epoch_N, the reference's
    checkpoint_best.pth — utils/util.py:51-65) wins over the latest epoch.

    Returns (state, epoch, kind) with kind in {"best", "epoch"}.
    """
    import jax.numpy as jnp

    def merge(raw):
        return state_template.replace(
            params=jax.tree.map(jnp.asarray, raw["params"]),
            batch_stats=jax.tree.map(jnp.asarray, raw["batch_stats"]),
            step=jnp.asarray(raw["step"]))

    best_dir = os.path.join(ckpt_dir, "best")
    if prefer_best and epoch is None and os.path.isdir(best_dir):
        subs = sorted(d for d in os.listdir(best_dir)
                      if d.startswith("epoch_"))
        if subs:
            ckptr = ocp.StandardCheckpointer()
            raw = ckptr.restore(os.path.join(os.path.abspath(best_dir),
                                             subs[-1]))
            return (merge(raw), int(subs[-1].split("_")[1]), "best")

    mgr = _manager(ckpt_dir)
    if epoch is None:
        epoch = mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    raw = mgr.restore(epoch)          # raw as-saved pytree, no template
    mgr.close()
    return merge(raw), epoch, "epoch"


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
