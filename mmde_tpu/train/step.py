"""Jitted train / eval steps and the TrainState container.

The reference's inner loop (train.py:191-249) does per-tensor host->device
copies, a DataParallel scatter/gather, and separate backward/step calls.
Here one jitted function fuses forward, loss, backward, optimizer update and
metric scalars; under a Mesh the batch is sharded on the data axis and XLA
inserts the gradient psum. Donated state buffers avoid HBM copies.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct, core

from mmde_tpu.losses import total_loss
from mmde_tpu.parallel.mesh import (DATA_AXIS, batch_sharding,
                                    replicated_sharding)


def _image(x):
    """Device-side image normalization for uint8-shipped batches.

    Loaders may ship RGB as uint8 (4x fewer host->device bytes; see
    AugmentPolicy.output_dtype) — u8/255 computed on device matches the
    host-side float32 conversion to <= 1 ulp per pixel (XLA may lower the
    divide as a reciprocal multiply). Float batches pass through."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    rng: jax.Array

    @classmethod
    def create(cls, params, batch_stats, tx, rng):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   rng=rng)


def init_model(model, rng, sample_batch, train: bool = False):
    """Initialize params + batch_stats from a sample batch."""
    kwargs = {}
    if "sparse_depth1" in sample_batch:
        kwargs = {"sparse1": sample_batch["sparse_depth1"],
                  "sparse2": sample_batch.get("sparse_depth2",
                                              sample_batch["sparse_depth1"])}
    variables = model.init({"params": rng}, _image(sample_batch["image1"]),
                           _image(sample_batch["image2"]), train, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    return params, batch_stats


def make_train_step(model, tx, *, decoder: str, lambda_rot: float,
                    lambda_trans: float, silog_lambda: float = 0.5,
                    donate: bool = True, mesh=None,
                    fused_collectives: bool = True,
                    deterministic: bool = False):
    """Build the jitted train step.

    step(state, batch) -> (new_state, metrics dict of scalars)
    batch keys: image1, image2 (B,H,W,3), depth1, depth2 (B,H,W),
    R12, T12 [, R21, T21].

    Under a mesh, two data-parallel lowerings:
      fused_collectives=True (default): shard_map body with ONE variadic
        pmean over (grads, aux, batch_stats). Batch-statistics ops (BN)
        normalize per shard — the reference torch-DataParallel semantics
        (train.py:93-97) — and per-shard masked-mean losses are averaged.
      fused_collectives=False: GSPMD jit with sharding annotations: XLA
        computes global-batch BN/losses exactly but emits one all-reduce
        per gradient tensor (~300 at flagship depth; fine on ICI, hours on
        an oversubscribed virtual-CPU mesh).
    Swin-family models (no BN) are numerically equivalent either way up to
    reduction order.

    deterministic=True applies the model in eval mode inside the train
    step: dropout/drop-path off, BN normalizes with running stats and does
    not update them. Gradients still flow — this exists so fused-vs-single
    equivalence can pin the WHOLE loss (incl. the pose head, whose
    Dropout(0.5) otherwise forces per-shard rng divergence) and for
    optimization debugging; production training keeps the default.
    """

    def loss_fn(params, batch_stats, batch, rngs):
        kwargs = {}
        if "sparse_depth1" in batch:
            kwargs = {"sparse1": batch["sparse_depth1"],
                      "sparse2": batch.get("sparse_depth2",
                                           batch["sparse_depth1"])}
        out, mutations = model.apply(
            {"params": params, "batch_stats": batch_stats},
            _image(batch["image1"]), _image(batch["image2"]),
            not deterministic, rngs=rngs, mutable=["batch_stats"], **kwargs)
        loss, aux = total_loss(out, batch, decoder=decoder,
                               lambda_rot=lambda_rot,
                               lambda_trans=lambda_trans,
                               silog_lambda=silog_lambda)
        return loss, (aux, mutations.get("batch_stats", batch_stats))

    def train_step(state: TrainState, batch, shard_idx=None):
        step_rng = jax.random.fold_in(state.rng, state.step)
        if shard_idx is not None:
            # distinct dropout/drop-path bits per data shard — without this
            # every shard would draw the same mask for its local rows
            step_rng = jax.random.fold_in(step_rng, shard_idx)
        rngs = {"dropout": jax.random.fold_in(step_rng, 0),
                "droppath": jax.random.fold_in(step_rng, 1)}
        grads, (aux, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rngs)
        if shard_idx is not None:
            # ONE fused cross-shard reduction for the whole step: psum of a
            # pytree binds every leaf into a single variadic all-reduce.
            # Under GSPMD this step instead compiles to one all-reduce PER
            # grad tensor (~300 at flagship depth); XLA CPU never combines
            # them, and on an oversubscribed host each barrier costs
            # minutes (each rendezvous blocks the shared thunk pool) — the
            # virtual-device dryrun only completes with the fused form. On
            # TPU the fused form is also fewer, larger ICI transfers.
            grads, aux, new_bs = jax.lax.pmean(
                (grads, aux, new_bs), DATA_AXIS)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, aux

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is None:
        return jax.jit(train_step, **kwargs)

    if not fused_collectives:
        rep = replicated_sharding(mesh)
        dat = batch_sharding(mesh)
        kwargs["in_shardings"] = (rep, dat)
        kwargs["out_shardings"] = (rep, rep)
        return jax.jit(train_step, **kwargs)

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def sharded_step(state, batch):
        return train_step(state, batch,
                          shard_idx=jax.lax.axis_index(DATA_AXIS))

    body = shard_map(sharded_step, mesh=mesh,
                     in_specs=(P(), P(DATA_AXIS)),
                     out_specs=(P(), P()),
                     check_rep=False)
    return jax.jit(body, **kwargs)


def make_eval_step(model, *, decoder: str, lambda_rot: float,
                   lambda_trans: float, silog_lambda: float = 0.5, mesh=None,
                   flip_tta: bool = False,
                   shift_window: Optional[int] = None,
                   shift_stride: Optional[int] = None):
    """Jitted eval forward + losses. Returns (preds, loss aux).

    flip_tta: horizontally mirror the frames, re-run, and average the
    un-mirrored depth maps (reference test.py:104-110); pose predictions
    come from the unflipped pass (mirroring changes the true pose).
    shift_window: slide (H x shift_window) crops across the width and
    recompose by coverage averaging (reference test.py:93-115, here wired
    for the two-frame family); a no-op when the image is not wider than the
    crop. Composable with flip_tta (flip applies over the composition).
    """

    def full_forward(variables, f1, f2, **kwargs):
        if shift_window and f1.shape[2] > shift_window:
            assert not kwargs, \
                "shift-window TTA + sparse-depth inputs not supported"
            from mmde_tpu.train import tta

            def fwd(c1, c2):
                return model.apply(variables, c1, c2, False)

            return tta.shift_window_eval_two_frame(
                fwd, f1, f2, crop=shift_window, stride=shift_stride)
        return model.apply(variables, f1, f2, False, **kwargs)

    def eval_step(state: TrainState, batch):
        kwargs = {}
        if "sparse_depth1" in batch:
            kwargs = {"sparse1": batch["sparse_depth1"],
                      "sparse2": batch.get("sparse_depth2",
                                           batch["sparse_depth1"])}
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        f1, f2 = _image(batch["image1"]), _image(batch["image2"])
        out = full_forward(variables, f1, f2, **kwargs)
        if flip_tta:
            fkwargs = {k: v[:, :, ::-1] for k, v in kwargs.items()}
            fout = full_forward(variables, f1[:, :, ::-1], f2[:, :, ::-1],
                                **fkwargs)
            out = dict(out)
            for k in ("pred_d1", "pred_d2"):
                out[k] = 0.5 * (out[k] + fout[k][:, :, ::-1])
        _, aux = total_loss(out, batch, decoder=decoder,
                            lambda_rot=lambda_rot, lambda_trans=lambda_trans,
                            silog_lambda=silog_lambda)
        return out, aux

    kwargs = {}
    if mesh is not None:
        rep = replicated_sharding(mesh)
        dat = batch_sharding(mesh)
        kwargs["in_shardings"] = (rep, dat)
        kwargs["out_shardings"] = (dat, rep)
    return jax.jit(eval_step, **kwargs)


def make_eval_metrics_step(model, *, dataset: str, decoder: str,
                           lambda_rot: float, lambda_trans: float,
                           silog_lambda: float = 0.5,
                           min_depth_eval: float, max_depth_eval: float,
                           do_kb_crop: bool = True, kitti_crop=None,
                           mesh=None, flip_tta: bool = False,
                           shift_window: Optional[int] = None,
                           shift_stride: Optional[int] = None):
    """Jitted eval forward + PER-SAMPLE metric suite, mesh-shardable.

    step(state, batch) -> (metrics dict of (B,) vectors, loss aux scalars).
    Under a mesh the batch is sharded over the data axis, so validation uses
    every chip (the plain make_eval_step path on one device left N-1 chips
    idle — the reference equivalent validated on all DataParallel GPUs,
    train.py:260-284). Metrics are per sample, matching the reference's
    batch-size-1 validate protocol exactly; the host averages them, masking
    padded tail samples by weight.
    """
    from mmde_tpu import metrics as M

    inner = make_eval_step(model, decoder=decoder, lambda_rot=lambda_rot,
                           lambda_trans=lambda_trans,
                           silog_lambda=silog_lambda, mesh=None,
                           flip_tta=flip_tta, shift_window=shift_window,
                           shift_stride=shift_stride)
    # reuse the un-jitted callable: jit-of-jit is fine (inner inlines)

    def metrics_step(state: TrainState, batch):
        preds, aux = inner(state, batch)
        pred_d1 = jnp.squeeze(preds["pred_d1"], -1)
        pred_c, gt_c, mask = M.eval_mask(
            dataset, pred_d1, batch["depth1"],
            min_depth_eval=min_depth_eval, max_depth_eval=max_depth_eval,
            do_kb_crop=do_kb_crop, kitti_crop=kitti_crop)
        depth_m = M.eval_depth_masked_per_sample(pred_c, gt_c, mask)
        pose_m = M.eval_pose_per_sample(
            {"R12": preds["pred_r12"], "T12": preds["pred_t12"],
             "R21": preds.get("pred_r21"), "T21": preds.get("pred_t21")},
            {"R12": batch["R12"], "T12": batch["T12"],
             "R21": batch.get("R21"), "T21": batch.get("T21")})
        return {**depth_m, **pose_m}, aux

    kwargs = {}
    if mesh is not None:
        rep = replicated_sharding(mesh)
        dat = batch_sharding(mesh)
        kwargs["in_shardings"] = (rep, dat)
        kwargs["out_shardings"] = (dat, rep)
    return jax.jit(metrics_step, **kwargs)


def make_forward(model):
    """Plain jittable inference forward (for TTA/serving)."""

    def forward(variables, frame1, frame2):
        return model.apply(variables, frame1, frame2, False)

    return forward
