#!/usr/bin/env python
"""Diagnose the scan_blocks compile-time blowup (docs/PERF.md round-2
caveat): compile the SAME flagship-structure train step scanned vs
unrolled on the LOCAL XLA:CPU backend and compare lower/compile wall
times and HLO sizes. If the scanned program is also an order of
magnitude slower to compile locally, the cost is the stacked-param scan
body itself (XLA working on one fat while-loop body with 18-layer
stacked operands); if local compile is comparable, the round-2 15-min
TPU timeout was the remote-tunnel compile path, not scan.

Usage: python tools/diag_scan_compile.py [--h 480 --w 640 --batch 12]
(CPU; defaults to a reduced spatial size so the diagnosis finishes on a
small host — the scan-vs-unrolled ratio, not the absolute time, is the
signal. Pass the flagship shape on a big host for absolute numbers.)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
# sitecustomize imports jax at interpreter startup and pins the remote-TPU
# platform; the env var alone is too late — force the config too (backends
# initialize lazily, so this works before the first jax op)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


def build(scan: bool, h: int, w: int, batch: int):
    import jax
    import jax.numpy as jnp
    from mmde_tpu.config import ModelConfig, SwinConfig
    from mmde_tpu.models import build_model
    from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
    from mmde_tpu.train.optim import build_optimizer
    from mmde_tpu.train.step import TrainState, init_model, make_train_step

    # window sizes must divide every stage map (scan requires the
    # window-resident layout): 256x256 -> stage maps 64/32/16/8, all
    # divisible by 8 (4 for the last stage)
    swin = SwinConfig(depths=(2, 2, 18, 2), window_size=(8, 8, 8, 4),
                      pretrain_window_size=(8, 8, 8, 4),
                      use_shift=(True, True, False, False),
                      drop_path_rate=0.3, use_checkpoint=True,
                      remat_policy="attn_out", scan_blocks=scan)
    cfg = ModelConfig(backbone="swin_base_v2", decoder="decoder_v2",
                      model_scale=32, max_depth=10.0, swin=swin,
                      dtype="bfloat16", use_pallas_attention=False)
    model = build_model(cfg)
    ds = SyntheticTwoFrameDataset(num_samples=batch, height=h, width=w)
    batch_np = next(ds.batches(batch, 1))
    jbatch = jax.tree.map(jnp.asarray, batch_np)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), jbatch)
    tx, _ = build_optimizer(params, backbone=cfg.backbone,
                            depths=cfg.swin.depths, max_lr=5e-4, min_lr=3e-5,
                            weight_decay=0.05, layer_decay=0.9,
                            steps_per_epoch=100, epochs=25)
    state = TrainState.create(params, batch_stats, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, decoder=cfg.decoder, lambda_rot=100.0,
                           lambda_trans=100.0, donate=False)
    return step, state, jbatch


def measure(scan: bool, h: int, w: int, batch: int):
    step, state, jbatch = build(scan, h, w, batch)
    t0 = time.perf_counter()
    lowered = step.lower(state, jbatch)
    t_lower = time.perf_counter() - t0
    hlo_chars = len(lowered.as_text())
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"scan={scan}: trace+lower {t_lower:7.1f}s  "
          f"compile {t_compile:7.1f}s  stablehlo {hlo_chars/1e6:.1f} MB",
          flush=True)
    return t_lower, t_compile, hlo_chars


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--batch", type=int, default=12)
    args = ap.parse_args()
    print(f"shape {args.h}x{args.w} batch {args.batch} "
          f"(flagship stage structure, XLA:CPU)", flush=True)
    u = measure(False, args.h, args.w, args.batch)
    s = measure(True, args.h, args.w, args.batch)
    ratio = s[1] / max(u[1], 1e-9)
    print(f"scan/unrolled compile-time ratio: {ratio:.1f}x  "
          f"hlo-size ratio: {s[2]/max(u[2],1):.2f}x", flush=True)


if __name__ == "__main__":
    main()
