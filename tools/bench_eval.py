"""Validation-path throughput at the flagship shape (round 5, VERDICT r4
next-steps #8): times the `make_eval_metrics_step` path — the exact jitted
step the training loop's validation and tools/eval.py run (forward + TTA
options + per-sample metric suite) — so the validation half of the loop has
a measured cost like the train half.

On this box there is ONE real chip, so the number is img/s/chip through the
metrics step; under a mesh the same step is batch-sharded
(step.make_eval_metrics_step(mesh=...)) and scales by data parallelism
with zero cross-chip traffic until the final host-side average (metrics
are per-sample vectors).

Usage: python tools/bench_eval.py [--flip-tta] [--batch N] [--steps N]
Reference equivalent being measured: validate() at train.py:260-284.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--flip-tta", action="store_true")
    args = p.parse_args()

    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"), min_compile_secs=0.0)

    import jax
    import jax.numpy as jnp
    from mmde_tpu.config import ModelConfig, SwinConfig
    from mmde_tpu.models import build_model
    from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
    from mmde_tpu.train.step import (TrainState, init_model,
                                     make_eval_metrics_step)
    from mmde_tpu.train.optim import build_optimizer

    H, W = 480, 640
    swin = SwinConfig(depths=(2, 2, 18, 2), window_size=(30, 30, 30, 15),
                      pretrain_window_size=(12, 12, 12, 6),
                      use_shift=(True, True, False, False),
                      drop_path_rate=0.3)
    cfg = ModelConfig(backbone="swin_base_v2", decoder="decoder_v2",
                      model_scale=32, max_depth=10.0, swin=swin,
                      dtype="bfloat16")
    model = build_model(cfg)
    ds = SyntheticTwoFrameDataset(num_samples=args.batch, height=H, width=W)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(args.batch, 1)))
    params, bstats = init_model(model, jax.random.PRNGKey(0), batch)
    tx, _ = build_optimizer(params, backbone=cfg.backbone,
                            depths=cfg.swin.depths, max_lr=5e-4, min_lr=3e-5,
                            weight_decay=0.05, layer_decay=0.9,
                            steps_per_epoch=100, epochs=25)
    state = TrainState.create(params, bstats, tx, jax.random.PRNGKey(1))

    step = make_eval_metrics_step(
        model, dataset="nyudepthv2", decoder=cfg.decoder, lambda_rot=100.0,
        lambda_trans=100.0, min_depth_eval=1e-4, max_depth_eval=10.0,
        do_kb_crop=False, flip_tta=args.flip_tta)
    compiled = step.lower(state, batch).compile()

    m, aux = compiled(state, batch)
    float(aux["loss_total"])                  # remote-runtime sync
    t0 = time.perf_counter()
    for _ in range(args.steps):
        m, aux = compiled(state, batch)
    float(aux["loss_total"])
    dt = time.perf_counter() - t0
    rate = args.batch * args.steps / dt
    print(f"eval metrics-step throughput: {rate:.2f} img/s/chip "
          f"(batch {args.batch}, flip_tta={args.flip_tta}, "
          f"{dt / args.steps * 1e3:.0f} ms/step)")


if __name__ == "__main__":
    main()
