"""Single-frame GLPDepth training/eval path.

Capability parity with the reference's legacy pipeline (backup/train_.py +
test.py): NYU/KITTI single-frame loaders, SiLog-only objective, validation
with the depth metric suite, flip + shift-window TTA at eval
(test.py:93-115), best-RMSE checkpointing.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mmde_tpu import metrics as M
from mmde_tpu.config import Config
from mmde_tpu.losses import silog_loss
from mmde_tpu.train.step import TrainState
from mmde_tpu.train import tta


def init_single(model, rng, sample_batch):
    variables = model.init({"params": rng}, sample_batch["image"], False)
    from flax import core
    return variables["params"], variables.get("batch_stats", core.FrozenDict())


def make_single_train_step(model, tx, *, silog_lambda: float = 0.5,
                           donate: bool = True, mesh=None):
    def loss_fn(params, batch_stats, batch, rngs):
        out, mut = model.apply({"params": params, "batch_stats": batch_stats},
                               batch["image"], True, rngs=rngs,
                               mutable=["batch_stats"])
        pred = jnp.squeeze(out["pred_d"], -1)
        loss = silog_loss(pred, batch["depth"], silog_lambda)
        return loss, (loss, mut.get("batch_stats", batch_stats))

    def step(state: TrainState, batch):
        rngs = {"dropout": jax.random.fold_in(state.rng, state.step),
                "droppath": jax.random.fold_in(state.rng, state.step + 1)}
        grads, (loss, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rngs)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), \
            {"loss_depth": loss}

    kwargs = {"donate_argnums": (0,)} if donate else {}
    if mesh is not None:
        from mmde_tpu.parallel.mesh import batch_sharding, replicated_sharding
        kwargs["in_shardings"] = (replicated_sharding(mesh),
                                  batch_sharding(mesh))
        kwargs["out_shardings"] = (replicated_sharding(mesh),
                                   replicated_sharding(mesh))
    return jax.jit(step, **kwargs)


def make_single_forward(model, state: TrainState):
    """Jitted (B, H, W, 3) -> (B, H, W, 1) depth forward for TTA."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward(images):
        return model.apply(variables, images, False)["pred_d"]

    return forward


def evaluate_single(model, state: TrainState, loader, cfg: Config, *,
                    flip_tta: bool = False, shift_window_tta: bool = False,
                    shift_crop: Optional[int] = None) -> Dict[str, float]:
    """Depth metric suite over an {image, depth} loader with optional TTA."""
    forward = make_single_forward(model, state)
    sums = {k: 0.0 for k in M.DEPTH_METRIC_NAMES}
    n = 0
    for batch in loader:
        img = jnp.asarray(batch["image"])
        gt = jnp.asarray(batch["depth"])
        if shift_window_tta:
            crop = shift_crop or img.shape[1]
            base = (lambda x: tta.flip_average(forward, x)) if flip_tta \
                else forward
            pred = tta.shift_window_eval(base, img, crop=crop)
        elif flip_tta:
            pred = tta.flip_average(forward, img)
        else:
            pred = forward(img)
        pred = jnp.squeeze(pred, -1)
        for b in range(pred.shape[0]):
            p, g, mask = M.eval_mask(
                cfg.data.dataset, pred[b], gt[b],
                min_depth_eval=cfg.eval.min_depth_eval,
                max_depth_eval=cfg.eval.max_depth_eval,
                do_kb_crop=cfg.data.do_kb_crop,
                kitti_crop=cfg.data.kitti_crop)
            for k, v in M.eval_depth_masked(p, g, mask).items():
                sums[k] += float(v)
            n += 1
    return {k: v / max(n, 1) for k, v in sums.items()}
