"""Benchmark: training-step throughput of the flagship model on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measures fwd+bwd+optimizer update (the reference's per-iter wall-clock at
train.py:248 is the comparable instrumentation) for swin_base_v2 +
decoder_v2 two-frame depth+pose at 480x640 in bf16.

vs_baseline: ratio against the PyTorch reference throughput measured on this
machine (tools/bench_torch_reference.py writes reference_baseline.json; the
reference repo publishes no numbers — BASELINE.md). 0.0 when unmeasured.

Env knobs: MMDE_BENCH_BATCH (default 4), MMDE_BENCH_STEPS (default 8),
MMDE_BENCH_SMALL=1 for a CPU-feasible shape.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    # honor an explicit platform request even though the container's
    # sitecustomize pre-imports jax with the axon TPU tunnel pinned
    # (backends initialize lazily, so this still applies)
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    # persistent compilation cache: first-time compiles of the flagship
    # train step take minutes through the remote-compile tunnel; cached
    # executables make repeat benchmark runs start in seconds. Keyed per
    # machine (utils/cache.py) so another host never attempts this host's
    # AOT entries.
    # min_compile_secs=0: the long tail of a bench run is ~10 minutes of
    # hundreds of sub-second init/setup compiles, each a remote-tunnel
    # round-trip; caching them makes warm reruns start in seconds.
    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"), min_compile_secs=0.0)
    import jax.numpy as jnp
    from mmde_tpu.config import ModelConfig, SwinConfig
    from mmde_tpu.models import build_model
    from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
    from mmde_tpu.train.optim import build_optimizer
    from mmde_tpu.train.step import TrainState, init_model, make_train_step

    small = os.environ.get("MMDE_BENCH_SMALL") == "1"
    batch_size = int(os.environ.get("MMDE_BENCH_BATCH", "8"))
    steps = int(os.environ.get("MMDE_BENCH_STEPS", "8"))

    if small:
        H, W = 96, 128
        swin = SwinConfig(depths=(2, 2, 2, 2), window_size=(6, 6, 6, 3),
                          pretrain_window_size=(6, 6, 6, 3),
                          use_shift=(True, True, False, False),
                          drop_path_rate=0.0)
        cfg = ModelConfig(backbone="swin_tiny_v2", decoder="decoder_v2",
                          model_scale=32, max_depth=10.0, swin=swin,
                          use_pallas_attention=False)
    else:
        H, W = 480, 640
        swin = SwinConfig(depths=(2, 2, 18, 2), window_size=(30, 30, 30, 15),
                          pretrain_window_size=(12, 12, 12, 6),
                          use_shift=(True, True, False, False),
                          drop_path_rate=0.3, use_checkpoint=True,
                          scan_blocks=os.environ.get("MMDE_BENCH_SCAN",
                                                     "0") == "1",
                          remat_policy=os.environ.get("MMDE_BENCH_REMAT",
                                                      "none"),
                          resident_pad_max=float(os.environ.get(
                              "MMDE_BENCH_RESPAD", "0.15")))
        cfg = ModelConfig(backbone="swin_base_v2", decoder="decoder_v2",
                          model_scale=32, max_depth=10.0, swin=swin,
                          dtype="bfloat16")

    model = build_model(cfg)
    ds = SyntheticTwoFrameDataset(num_samples=batch_size * 2, height=H,
                                  width=W)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(batch_size, 1)))

    params, batch_stats = init_model(model, jax.random.PRNGKey(0), batch)
    tx, _ = build_optimizer(params, backbone=cfg.backbone,
                            depths=cfg.swin.depths, max_lr=5e-4, min_lr=3e-5,
                            weight_decay=0.05, layer_decay=0.9,
                            steps_per_epoch=100, epochs=25)
    state = TrainState.create(params, batch_stats, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, decoder=cfg.decoder, lambda_rot=100.0,
                           lambda_trans=100.0, donate=True)

    # AOT-compile ONCE and reuse the executable for warmup, timing, and
    # cost analysis (step(...) then step.lower().compile() hash to
    # different persistent-cache keys, so the old flow paid the flagship
    # compile twice per fresh run).
    compiled = step.lower(state, batch).compile()

    # MFU vs the chip's own sustained bf16 matmul rate (a large matmul on
    # this v5e measures 122 TFLOP/s, docs/PERF.md) using XLA's flop count
    # for the compiled step. Dh=32 against the 128-wide MXU caps the
    # achievable ratio at ~25% for the attention share (docs/PERF.md).
    # XLA's count includes remat recompute; algorithmic fwd+bwd flops
    # (3x a forward pass, no recompute) are reported alongside so the
    # model MFU is not overstated.
    tflops_per_step = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        tflops_per_step = float(cost.get("flops", 0.0)) / 1e12
    except Exception:
        pass
    algo_tflops_per_step = 0.0
    try:
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, False))
        fcost = fwd.lower({"params": state.params,
                           "batch_stats": state.batch_stats},
                          batch["image1"], batch["image2"]
                          ).compile().cost_analysis()
        if isinstance(fcost, (list, tuple)):
            fcost = fcost[0]
        algo_tflops_per_step = 3.0 * float(fcost.get("flops", 0.0)) / 1e12
    except Exception:
        pass

    # warmup. NOTE: under the axon remote runtime, block_until_ready
    # returns before execution completes; fetching the scalar value is the
    # only reliable sync, so we force it.
    state, aux = compiled(state, batch)
    float(aux["loss_total"])
    state, aux = compiled(state, batch)
    float(aux["loss_total"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = compiled(state, batch)
    float(aux["loss_total"])
    dt = time.perf_counter() - t0

    n_chips = 1  # single-chip bench
    images_per_sec = batch_size * steps / dt / n_chips

    achieved_tflops = tflops_per_step * steps / dt
    mfu = achieved_tflops / 122.0 if tflops_per_step else 0.0
    algo_mfu = (algo_tflops_per_step * steps / dt / 122.0
                if algo_tflops_per_step else 0.0)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "reference_baseline.json")
    vs_baseline = 0.0
    if os.path.exists(base_path):
        with open(base_path) as f:
            ref = json.load(f).get("images_per_sec", 0.0)
        if ref > 0:
            vs_baseline = images_per_sec / ref

    # Key order is deliberate: MFU (the honest absolute anchor on this
    # chip) leads; vs_baseline is a CPU-PROXY ratio (the reference
    # publishes no GPU numbers — BASELINE.md) and is annotated as such so
    # a reader of this JSON alone is not misled by its magnitude.
    print(json.dumps({
        "metric": "train_images_per_sec_swin_base_480x640_bf16"
                  if not small else "train_images_per_sec_small",
        "value": round(images_per_sec, 3),
        "unit": "images/sec/chip",
        "mfu_vs_sustained_122tflops": round(mfu, 4),
        "algo_mfu_vs_sustained_122tflops": round(algo_mfu, 4),
        # vs the chip's 197 TF/s bf16 peak (the 122 anchor is a measured
        # 8k-matmul rate; round-5 profiling showed 3x3 convs reach ~194,
        # so peak is the stricter honest denominator)
        "mfu_vs_peak_197tflops": round(mfu * 122.0 / 197.0, 4),
        "tflops_per_step": round(tflops_per_step, 2),
        "achieved_tflops_per_sec": round(achieved_tflops, 2),
        "algo_tflops_per_step_3xfwd": round(algo_tflops_per_step, 2),
        "vs_baseline": round(vs_baseline, 3),
        "vs_baseline_note": ("CPU-proxy ratio: torch reference measured on "
                             "THIS HOST'S CPU (reference_baseline.json); the "
                             "reference publishes no GPU numbers. Use the "
                             "MFU fields as the absolute anchor."),
    }))


if __name__ == "__main__":
    main()
