#!/usr/bin/env python
"""Evaluation CLI (capability parity with reference test.py /
test_void_with_*.py): restore a checkpoint, run the eval split with optional
flip / shift-window TTA, print the metric table, optionally export 16-bit
depth PNGs and visualization panels.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser(description="mmde_tpu evaluator")
    p.add_argument("--config", type=str, required=False)
    p.add_argument("--ckpt", type=str, default=None,
                   help="orbax checkpoint dir (train run's ckpt/)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--flip-tta", action="store_true")
    p.add_argument("--shift-window-tta", action="store_true")
    p.add_argument("--save-pngs", type=str, default=None,
                   help="dir for 16-bit depth PNG export")
    p.add_argument("--save-viz", type=str, default=None,
                   help="dir for comparison panels")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--max-batches", type=int, default=None)
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmde_tpu.config import Config, load_yaml
    from mmde_tpu.models import build_model
    from mmde_tpu.train.loop import build_datasets, validate
    from mmde_tpu.train.step import (TrainState, init_model, make_eval_step,
                                     make_eval_metrics_step)
    from mmde_tpu.train import tta
    from mmde_tpu.data.loader import DataLoader
    from mmde_tpu.utils.logging import display_result
    from mmde_tpu.utils import viz
    from mmde_tpu.ckpt import orbax_io

    cfg = load_yaml(args.config) if args.config else Config()
    model = build_model(cfg.model)
    _, val_ds = build_datasets(cfg, args.synthetic)
    val_loader = DataLoader(val_ds, 1, shuffle=False, num_workers=2,
                            drop_last=False)

    sample = next(iter(DataLoader(val_ds, 1, shuffle=False, num_workers=0)))
    sample_j = {k: jnp.asarray(v) for k, v in sample.items()
                if isinstance(v, np.ndarray)}
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), sample_j)
    import optax
    state = TrainState.create(params, batch_stats,
                              optax.identity(), jax.random.PRNGKey(0))
    if args.ckpt:
        state, epoch, kind = orbax_io.restore_eval(args.ckpt, state)
        print(f"restored {kind} checkpoint (epoch {epoch}) from {args.ckpt}")

    shift_window = cfg.data.crop_h if args.shift_window_tta else None
    eval_fn = make_eval_step(model, decoder=cfg.model.decoder,
                             lambda_rot=cfg.train.loss_lambda1,
                             lambda_trans=cfg.train.loss_lambda2,
                             flip_tta=args.flip_tta,
                             shift_window=shift_window)
    if args.flip_tta:
        print("TTA: horizontal-flip averaging enabled")
    if args.shift_window_tta:
        print(f"TTA: shift-window over {shift_window}-px crops "
              f"(ref test.py:93-115, two-frame composition)")

    metrics_fn = make_eval_metrics_step(
        model, dataset=cfg.data.dataset, decoder=cfg.model.decoder,
        lambda_rot=cfg.train.loss_lambda1,
        lambda_trans=cfg.train.loss_lambda2,
        min_depth_eval=cfg.eval.min_depth_eval,
        max_depth_eval=cfg.eval.max_depth_eval,
        do_kb_crop=cfg.data.do_kb_crop, kitti_crop=cfg.data.kitti_crop,
        flip_tta=args.flip_tta, shift_window=shift_window)
    result, losses = validate(metrics_fn, state, _limited(val_loader,
                                                          args.max_batches),
                              cfg)
    print(display_result(result))
    print("losses:", {k: round(v, 5) for k, v in losses.items()})

    if args.save_pngs or args.save_viz:
        n = 0
        for batch in _limited(val_loader, args.max_batches):
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            preds, _ = eval_fn(state, arrays)
            d1 = np.asarray(jnp.squeeze(preds["pred_d1"], -1))[0]
            d2 = np.asarray(jnp.squeeze(preds["pred_d2"], -1))[0]
            name = batch.get("filename", [f"sample_{n}"])[0]
            if args.save_pngs:
                # per-frame artifacts + pose txt, as the reference evaluators
                # export (test_void_with_custom_network.py:85-120)
                os.makedirs(args.save_pngs, exist_ok=True)
                viz.save_depth_png16(os.path.join(args.save_pngs,
                                                  f"{n:05d}_d1.png"),
                                     d1, cfg.data.dataset)
                viz.save_depth_png16(os.path.join(args.save_pngs,
                                                  f"{n:05d}_d2.png"),
                                     d2, cfg.data.dataset)
                viz.save_pose_txt(
                    args.save_pngs, f"pose_{n:05d}",
                    np.asarray(arrays["R12"][0]),
                    np.asarray(preds["pred_r12"][0]),
                    np.asarray(arrays["T12"][0]),
                    np.asarray(preds["pred_t12"][0]))
            if args.save_viz:
                viz.save_comparison_panel(
                    args.save_viz, str(name).replace("/", "_"),
                    np.asarray(arrays["image1"][0]),
                    np.asarray(arrays["image2"][0]),
                    np.asarray(arrays["depth1"][0]),
                    np.asarray(arrays["depth2"][0]), d1, d2)
                viz.save_pose_txt(
                    args.save_viz, f"pose_{n:05d}",
                    np.asarray(arrays["R12"][0]),
                    np.asarray(preds["pred_r12"][0]),
                    np.asarray(arrays["T12"][0]),
                    np.asarray(preds["pred_t12"][0]))
            n += 1


def _limited(loader, max_batches):
    if not max_batches:
        return loader
    def gen():
        for i, b in enumerate(loader):
            if i >= max_batches:
                break
            yield b
    return gen()


if __name__ == "__main__":
    main()
