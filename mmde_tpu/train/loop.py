"""Training driver: epoch loop, validation, checkpointing, logging.

Capability parity with reference train.py main()/train()/validate()
(train.py:63-401), re-structured around jitted steps:
  * per-step LR from the poly schedule lives inside the optimizer (no
    per-group python loop);
  * one fused jitted train step per batch (forward+loss+bwd+update);
  * validation computes the full depth metric suite + pose MSE/cycle metrics
    on device with masked reductions;
  * per-epoch orbax checkpoints + best-RMSE tracking + scalar logging.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmde_tpu import metrics as M
from mmde_tpu.config import Config
from mmde_tpu.models import build_model
from mmde_tpu.train.optim import build_optimizer
from mmde_tpu.train.step import (TrainState, init_model,
                                 make_eval_metrics_step, make_train_step)
from mmde_tpu.parallel.mesh import make_mesh, replicated_sharding
from mmde_tpu.data.loader import DataLoader, device_prefetch
from mmde_tpu.utils.logging import (AverageMeter, ScalarWriter,
                                    display_result, log_args_to_txt)
from mmde_tpu.ckpt import orbax_io

METRIC_NAMES = M.ALL_METRIC_NAMES


def build_datasets(cfg: Config, synthetic: bool = False):
    """Dataset factory keyed on cfg.data.dataset (reference picks loaders at
    train.py:102-108; see mmde_tpu.data for each)."""
    if cfg.data.dataset == "synthetic_learnable":
        # Convergence-gate data (tools/convergence_gate.py): depth is
        # embedded in the red channel so the task is learnable; val is a
        # disjoint held-out draw (different seed) — the gate proves the
        # full system LEARNS, not memorizes.
        from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
        u8 = cfg.data.ship_uint8
        # 256 samples: enough that clearing the held-out thresholds
        # requires LEARNING the cue->depth rule (64 samples plateaued at
        # val d1 ~0.46 by memorizing textures — round 5)
        train = SyntheticTwoFrameDataset(
            num_samples=max(256, 8 * cfg.train.batch_size),
            height=cfg.data.crop_h, width=cfg.data.crop_w,
            max_depth=cfg.model.max_depth, seed=1, depth_cue=True,
            uint8_images=u8)
        val = SyntheticTwoFrameDataset(
            num_samples=8, height=cfg.data.crop_h, width=cfg.data.crop_w,
            max_depth=cfg.model.max_depth, seed=7, depth_cue=True,
            uint8_images=u8)
        return train, val
    if synthetic or cfg.data.dataset == "synthetic":
        from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
        # enough samples for a few steady-state print windows per epoch at
        # the configured batch size (throughput measurement needs > one
        # print_freq window after warmup)
        n_train = max(64, 24 * cfg.train.batch_size)
        u8 = cfg.data.ship_uint8
        train = SyntheticTwoFrameDataset(num_samples=n_train,
                                         height=cfg.data.crop_h,
                                         width=cfg.data.crop_w,
                                         max_depth=cfg.model.max_depth,
                                         uint8_images=u8)
        val = SyntheticTwoFrameDataset(num_samples=8, height=cfg.data.crop_h,
                                       width=cfg.data.crop_w,
                                       max_depth=cfg.model.max_depth, seed=7,
                                       uint8_images=u8)
        return train, val
    if cfg.data.dataset == "void":
        from mmde_tpu.data.void_v3 import VoidV3
        info_dir = cfg.data.void_meta_dir or \
            os.path.join(cfg.data.data_path, "meta")
        train = VoidV3(cfg.data.data_path,
                       os.path.join(info_dir, "train_image.txt"),
                       os.path.join(info_dir, "calibration.json"),
                       is_train=True,
                       crop_size=(cfg.data.crop_h, cfg.data.crop_w),
                       image_interval_range=cfg.data.image_interval_range,
                       imu_max_len=cfg.data.imu_max_len)
        val = VoidV3(cfg.data.data_path,
                     os.path.join(info_dir, "test_image.txt"),
                     os.path.join(info_dir, "calibration.json"),
                     is_train=False,
                     crop_size=(cfg.data.crop_h, cfg.data.crop_w),
                     image_interval_range=cfg.data.image_interval_range,
                     imu_max_len=cfg.data.imu_max_len)
        return train, val
    if cfg.data.dataset == "nyudepthv2":
        from mmde_tpu.data.datasets import NYUDepthV2Pairs
        fn = os.path.join(cfg.data.data_path, "filenames")
        train = NYUDepthV2Pairs(cfg.data.data_path, fn, True,
                                (cfg.data.crop_h, cfg.data.crop_w))
        val = NYUDepthV2Pairs(cfg.data.data_path, fn, False,
                              (cfg.data.crop_h, cfg.data.crop_w))
        return train, val
    if cfg.data.dataset == "kitti":
        # KITTI Eigen split (single-frame; ref dataset/kitti.py consumed by
        # the legacy GLPDepth path). Wrapped in the unified two-frame schema
        # (self-paired, identity pose) so every decoder family trains on it.
        from mmde_tpu.data.datasets import KITTIEigen
        from mmde_tpu.data.mixed import UnifiedTwoFrame
        crop = (cfg.data.crop_h, cfg.data.crop_w)
        fn = os.path.join(cfg.data.data_path, "filenames")
        train = UnifiedTwoFrame(
            KITTIEigen(cfg.data.data_path, fn, True, crop), "single_frame",
            crop, 0)
        val = UnifiedTwoFrame(
            KITTIEigen(cfg.data.data_path, fn, False, crop), "single_frame",
            crop, 0)
        return train, val
    if cfg.data.dataset == "mixed":
        # NYU + KITTI + VOID joint training (BASELINE config 5): every
        # source whose directory exists under data_path joins the mix.
        from mmde_tpu.data.mixed import MixedDataset, UnifiedTwoFrame
        from mmde_tpu.data.datasets import (KITTIEigen, NYUDepthV2,
                                            NYUDepthV2Pairs)
        from mmde_tpu.data.void_v3 import VoidV3
        crop = (cfg.data.crop_h, cfg.data.crop_w)
        fn = os.path.join(cfg.data.data_path, "filenames")
        meta = cfg.data.void_meta_dir or os.path.join(cfg.data.data_path,
                                                      "meta")
        train_sources, val_sources = [], []
        if os.path.isdir(os.path.join(cfg.data.data_path, "nyu_depth_v2")):
            train_sources.append(UnifiedTwoFrame(
                NYUDepthV2Pairs(cfg.data.data_path, fn, True, crop),
                "two_frame", crop, 0))
            val_sources.append(UnifiedTwoFrame(
                NYUDepthV2Pairs(cfg.data.data_path, fn, False, crop),
                "two_frame", crop, 0))
        if os.path.isdir(os.path.join(cfg.data.data_path, "kitti")):
            train_sources.append(UnifiedTwoFrame(
                KITTIEigen(cfg.data.data_path, fn, True, crop),
                "single_frame", crop, 1))
            val_sources.append(UnifiedTwoFrame(
                KITTIEigen(cfg.data.data_path, fn, False, crop),
                "single_frame", crop, 1))
        if os.path.isdir(os.path.join(cfg.data.data_path, "void_release")):
            train_sources.append(UnifiedTwoFrame(
                VoidV3(cfg.data.data_path,
                       os.path.join(meta, "train_image.txt"),
                       os.path.join(meta, "calibration.json"), True, crop,
                       cfg.data.image_interval_range, cfg.data.imu_max_len),
                "two_frame_pose", crop, 2))
            val_sources.append(UnifiedTwoFrame(
                VoidV3(cfg.data.data_path,
                       os.path.join(meta, "test_image.txt"),
                       os.path.join(meta, "calibration.json"), False, crop,
                       cfg.data.image_interval_range, cfg.data.imu_max_len),
                "two_frame_pose", crop, 2))
        if not train_sources:
            raise FileNotFoundError(
                f"no dataset roots found under {cfg.data.data_path}")
        return (MixedDataset(train_sources, seed=cfg.train.seed),
                MixedDataset(val_sources, seed=cfg.train.seed + 1))
    raise ValueError(f"unknown dataset '{cfg.data.dataset}'")


def validate(metrics_step, state, val_loader, cfg: Config,
             n_shards: int = 1) -> Dict[str, float]:
    """Full eval pass with per-sample metrics (the reference's batch-size-1
    protocol, train.py:311-399). Batches are padded up to a multiple of
    `n_shards` so the jitted step shards cleanly over the mesh; padded tail
    samples are excluded from the averages by weight."""
    sums = {k: 0.0 for k in METRIC_NAMES}
    loss_meters = {k: AverageMeter() for k in
                   ("loss_depth", "loss_rotation", "loss_translation")}
    n_samples = 0
    for batch in val_loader:
        arrays = {k: np.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        B = arrays["image1"].shape[0]
        pad = (-B) % n_shards
        if pad:
            arrays = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                for k, v in arrays.items()}
        per_sample, aux = metrics_step(
            state, {k: jnp.asarray(v) for k, v in arrays.items()})
        per_sample = jax.device_get(per_sample)
        for k, v in per_sample.items():
            sums[k] += float(np.sum(v[:B]))
        for k in loss_meters:
            loss_meters[k].update(float(aux[k]), B)
        n_samples += B
    result = {k: v / max(n_samples, 1) for k, v in sums.items()}
    losses = {k: m.avg for k, m in loss_meters.items()}
    return result, losses


def train(cfg: Config, *, synthetic: bool = False, log_dir: Optional[str] = None,
          max_steps_per_epoch: Optional[int] = None,
          use_mesh: bool = True,
          prestage_batches: int = 0) -> Dict[str, float]:
    """Run the full training job; returns the last validation metrics.

    prestage_batches > 0: materialize that many batches ON DEVICE before
    the loop and cycle them, removing the host producer from the epoch
    entirely. A measurement mode (train-loop rate == chip rate even on a
    1-core host where the producer thread would otherwise serialize with
    the consumer — docs/PERF.md 'train loop vs bench'); epochs then train
    on a fixed set of batches, so don't use it for real runs."""
    log_dir = log_dir or os.path.join(cfg.log_dir, time.strftime("%m%d_%H%M%S"))
    os.makedirs(log_dir, exist_ok=True)
    writer = ScalarWriter(log_dir)
    log_txt = os.path.join(log_dir, "logs.txt")
    log_args_to_txt(log_txt, cfg)
    ckpt_dir = os.path.join(log_dir, "ckpt")

    train_ds, val_ds = build_datasets(cfg, synthetic)
    if cfg.data.ship_uint8:
        # flip the augmentation output to uint8 (4x fewer host->device
        # bytes); the jitted steps normalize on device (train/step._image)
        import dataclasses as _dc
        for ds in (train_ds, val_ds):
            if hasattr(ds, "policy"):
                ds.policy = _dc.replace(ds.policy, output_dtype="uint8")
    train_loader = DataLoader(train_ds, cfg.train.batch_size,
                              shuffle=True, num_workers=cfg.data.workers,
                              drop_last=True, seed=cfg.train.seed)
    # val batch = device count so sharded validation feeds every chip
    # (metrics stay per-sample — reference bs-1 protocol; validate() pads
    # the non-divisible tail batch and masks it out of the averages)
    n_val_batch = jax.device_count() if (use_mesh and
                                         jax.device_count() > 1) else 1
    val_loader = DataLoader(val_ds, n_val_batch, shuffle=False,
                            num_workers=min(cfg.data.workers, 2),
                            drop_last=False)
    steps_per_epoch = len(train_loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    model = build_model(cfg.model)
    sample = next(iter(DataLoader(train_ds, cfg.train.batch_size,
                                  shuffle=False, num_workers=0)))
    sample_j = {k: jnp.asarray(v) for k, v in sample.items()
                if isinstance(v, np.ndarray)}
    params, batch_stats = init_model(model, jax.random.PRNGKey(cfg.train.seed),
                                     sample_j)
    if cfg.model.swin.pretrained:
        from mmde_tpu.ckpt.pretrained import load_pretrained
        params, batch_stats = load_pretrained(
            dict(params), dict(batch_stats), cfg.model,
            cfg.model.swin.pretrained)
    tx, schedule = build_optimizer(
        params, backbone=cfg.model.backbone, depths=cfg.model.swin.depths,
        max_lr=cfg.train.max_lr, min_lr=cfg.train.min_lr,
        weight_decay=cfg.train.weight_decay, layer_decay=cfg.train.layer_decay,
        steps_per_epoch=steps_per_epoch, epochs=cfg.train.epochs,
        frozen_stages=cfg.model.swin.frozen_stages)
    state = TrainState.create(params, batch_stats, tx,
                              jax.random.PRNGKey(cfg.train.seed + 1))

    mesh = None
    if use_mesh and jax.device_count() > 1:
        mesh = make_mesh()
        state = jax.device_put(state, replicated_sharding(mesh))

    step_fn = make_train_step(model, tx, decoder=cfg.model.decoder,
                              lambda_rot=cfg.train.loss_lambda1,
                              lambda_trans=cfg.train.loss_lambda2,
                              silog_lambda=cfg.train.silog_lambda, mesh=mesh)
    # validation shards over the same mesh (batch padded to a multiple of
    # the device count in validate()); one device otherwise
    n_shards = mesh.devices.size if mesh is not None else 1
    eval_fn = make_eval_metrics_step(
        model, dataset=cfg.data.dataset, decoder=cfg.model.decoder,
        lambda_rot=cfg.train.loss_lambda1,
        lambda_trans=cfg.train.loss_lambda2,
        silog_lambda=cfg.train.silog_lambda,
        min_depth_eval=cfg.eval.min_depth_eval,
        max_depth_eval=cfg.eval.max_depth_eval,
        do_kb_crop=cfg.data.do_kb_crop, kitti_crop=cfg.data.kitti_crop,
        mesh=mesh)

    start_epoch = 1
    if cfg.train.resume_from == "auto":
        # auto-resume from the newest checkpoint in this run's ckpt dir
        # (live version of the reference's commented-out glob,
        # train.py:123-131 / backup/train_.py:152-162)
        latest = orbax_io.latest_epoch(ckpt_dir)
        if latest is not None:
            state, resumed = orbax_io.restore(ckpt_dir, state, latest)
            start_epoch = resumed + 1
            print(f"auto-resumed from epoch {resumed}")
    elif cfg.train.resume_from:
        state, resumed = orbax_io.restore(cfg.train.resume_from, state)
        start_epoch = resumed + 1
        print(f"resumed from epoch {resumed} ({cfg.train.resume_from})")

    best = orbax_io.BestTracker(ckpt_dir)
    last_val = {}
    epoch_losses = []
    staged: list = []                 # prestage_batches device-batch cache
    for epoch in range(start_epoch, cfg.train.epochs + 1):
        meters = {k: AverageMeter() for k in
                  ("loss_total", "loss_depth", "loss_rotation",
                   "loss_translation")}
        # Aux scalars stay on device between print points: fetching them
        # every step forces a host<->device sync per step and defeats the
        # prefetch pipeline (the pattern bench.py avoids). pending holds
        # device-side aux dicts; drain() fetches them in one transfer.
        pending = []
        drain_t0 = None
        rate = 0.0

        def drain():
            nonlocal drain_t0, rate
            if not pending:
                return
            vals = jax.device_get(pending)  # one sync for all queued steps
            now = time.perf_counter()
            for a in vals:
                for k in meters:
                    meters[k].update(float(a[k]), cfg.train.batch_size)
            if drain_t0 is not None and now > drain_t0:
                rate = cfg.train.batch_size * len(vals) / (now - drain_t0)
            drain_t0 = now
            pending.clear()

        if prestage_batches:
            import itertools
            if not staged:
                for b in device_prefetch(iter(train_loader), mesh=mesh):
                    staged.append(b)
                    if len(staged) >= prestage_batches:
                        break
            batches_iter = itertools.islice(itertools.cycle(staged),
                                            len(train_loader))
        else:
            batches_iter = device_prefetch(iter(train_loader), mesh=mesh)
        for i, batch in enumerate(batches_iter):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            arrays = {k: v for k, v in batch.items()
                      if not isinstance(v, list)}
            state, aux = step_fn(state, arrays)
            pending.append(aux)
            if i % cfg.train.print_freq == 0:
                drain()
                lr = float(schedule(int(state.step) - 1))
                line = (f"Epoch [{epoch}/{cfg.train.epochs}] step {i} "
                        f"loss {meters['loss_total'].avg:.4f} "
                        f"(d {meters['loss_depth'].avg:.4f} "
                        f"R {meters['loss_rotation'].avg:.4f} "
                        f"T {meters['loss_translation'].avg:.4f}) "
                        f"lr {lr:.2e} "
                        f"{rate:.1f} img/s")
                print(line)
                with open(log_txt, "a") as f:
                    f.write(line + "\n")
        drain()

        for k, m in meters.items():
            writer.add_scalar(f"train/{k}", m.avg, epoch)
        epoch_losses.append(meters["loss_total"].avg)

        if cfg.train.save_model and epoch % cfg.train.save_freq == 0:
            orbax_io.save_epoch(ckpt_dir, state, epoch)

        if epoch % cfg.train.val_freq == 0:
            result, losses = validate(eval_fn, state, val_loader, cfg,
                                      n_shards=n_shards)
            last_val = result
            print(display_result(result))
            with open(log_txt, "a") as f:
                f.write(display_result(result))
            for k, v in result.items():
                writer.add_scalar(f"val/{k}", v, epoch)
            for k, v in losses.items():
                writer.add_scalar(f"val/{k}", v, epoch)
            if cfg.train.save_model:
                best.update(state, epoch, result["rmse"])

    # end-of-training loss-curve artifact (ref train.py:174-177)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure()
        plt.plot(range(1, len(epoch_losses) + 1), epoch_losses, label="avg")
        plt.xlabel("epoch")
        plt.ylabel("train loss")
        plt.legend()
        plt.savefig(os.path.join(log_dir, "Train_Losses.png"))
        plt.close()
    except Exception:
        pass

    writer.close()
    return last_val
