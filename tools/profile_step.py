"""Capture a jax.profiler trace of the flagship train step and print an
op-category time breakdown (the docs/PERF.md bucket table).

Parses the xplane proto from the trace directory directly (no TensorBoard
needed): sums device-lane event durations grouped by a coarse op-category
heuristic on the event/HLO names.

Usage: python tools/profile_step.py [--batch 4] [--steps 3]
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "mosaic" in n or "tpu_custom_call" in n:
        return "pallas"
    if n.startswith("copy") or ".copy" in n or "copy-start" in n \
            or "copy-done" in n:
        return "copy"
    if n.startswith("transpose") or "transpose" in n[:24]:
        return "transpose"
    if n.startswith("reshape") or "bitcast" in n[:16]:
        return "reshape"
    if n.startswith("pad"):
        return "pad"
    if n.startswith("slice") or n.startswith("dynamic-slice") \
            or n.startswith("dynamic-update"):
        return "slice"
    if n.startswith("convolution") or n.startswith("conv"):
        return "conv"
    if n.startswith("dot") or "matmul" in n or n.startswith("fusion.dot"):
        return "dot"
    if n.startswith("fusion") or n.startswith("loop_"):
        return "fusion"
    if n.startswith("broadcast") or n.startswith("iota") \
            or n.startswith("concatenate") or n.startswith("reduce"):
        return "elementwise/reduce"
    if "infeed" in n or "outfeed" in n or "all-reduce" in n:
        return "comm/io"
    return "other"


def parse_xplane(path: str):
    """Minimal xplane proto reader: returns [(plane_name, line_name,
    event_metadata_name, total_duration_ps, count)]. Uses the
    tensorflow-free `xprof`/tsl proto if importable, else raw decode."""
    from jax.profiler import ProfileData  # jax >= 0.4.30
    pd = ProfileData.from_serialized_xspace(open(path, "rb").read())
    out = []
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                nm = ev.name
                out.append((plane.name, line.name, nm,
                            ev.duration_ns))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/mmde_profile")
    ap.add_argument("--parse-only", action="store_true",
                    help="reparse an existing trace dir, skip running")
    args = ap.parse_args()
    if args.parse_only:
        report(args)
        return

    import jax
    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
        min_compile_secs=0.0)
    import jax.numpy as jnp
    from mmde_tpu.config import ModelConfig, SwinConfig
    from mmde_tpu.models import build_model
    from mmde_tpu.data.synthetic import SyntheticTwoFrameDataset
    from mmde_tpu.train.optim import build_optimizer
    from mmde_tpu.train.step import TrainState, init_model, make_train_step

    H, W = 480, 640
    swin = SwinConfig(depths=(2, 2, 18, 2), window_size=(30, 30, 30, 15),
                      pretrain_window_size=(12, 12, 12, 6),
                      use_shift=(True, True, False, False),
                      drop_path_rate=0.3, use_checkpoint=True,
                      remat_policy=os.environ.get("MMDE_BENCH_REMAT",
                                                  "none"))
    cfg = ModelConfig(backbone="swin_base_v2", decoder="decoder_v2",
                      model_scale=32, max_depth=10.0, swin=swin,
                      dtype="bfloat16")
    model = build_model(cfg)
    ds = SyntheticTwoFrameDataset(num_samples=args.batch * 2, height=H,
                                  width=W)
    batch = jax.tree.map(jnp.asarray, next(ds.batches(args.batch, 1)))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), batch)
    tx, _ = build_optimizer(params, backbone=cfg.backbone,
                            depths=cfg.swin.depths, max_lr=5e-4, min_lr=3e-5,
                            weight_decay=0.05, layer_decay=0.9,
                            steps_per_epoch=100, epochs=25)
    state = TrainState.create(params, batch_stats, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, decoder=cfg.decoder, lambda_rot=100.0,
                           lambda_trans=100.0, donate=True)

    # AOT-compile via the same lower().compile() flow as bench.py so the
    # two tools share one persistent-cache entry for the flagship step.
    compiled = step.lower(state, batch).compile()
    state, aux = compiled(state, batch)
    float(aux["loss_total"])

    os.system(f"rm -rf {args.logdir}")
    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        state, aux = compiled(state, batch)
    float(aux["loss_total"])
    jax.profiler.stop_trace()

    report(args)


def report(args):
    files = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane files found under", args.logdir)
        return
    # "XLA Ops" is the real sequential compute timeline; "Async XLA Ops"
    # are overlapping DMA spans (duration includes queue wait) — summed
    # separately, never into the compute total.
    cats = defaultdict(float)
    names = defaultdict(float)
    by_cat_event = defaultdict(lambda: defaultdict(lambda: [0.0, 0]))
    async_ms = 0.0
    for f in files:
        for plane, line, name, dur_ns in parse_xplane(f):
            if line == "XLA Ops":
                c = categorize(name)
                cats[c] += dur_ns / 1e6
                names[name.split(".")[0][:44]] += dur_ns / 1e6
                e = by_cat_event[c][name[:140]]
                e[0] += dur_ns / 1e6
                e[1] += 1
            elif line == "Async XLA Ops":
                async_ms += dur_ns / 1e6
    total = sum(cats.values())
    print(f"\n== XLA Ops category totals over {args.steps} steps "
          f"(ms, compute lane) ==")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {v:9.1f}  ({100*v/max(total,1e-9):4.1f}%)"
              f"  per-step {v/args.steps:7.1f}")
    print(f"  {'TOTAL':20s} {total:9.1f}           per-step "
          f"{total/args.steps:7.1f}")
    print(f"  async-DMA span total {async_ms:9.1f} (overlaps compute; "
          f"includes queue wait)")
    print("\n== top-20 op names (summed ms) ==")
    for k, v in sorted(names.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {v:9.1f}  {k}")
    for cat in ("copy", "pallas", "other", "pad", "reshape"):
        if cat not in by_cat_event:
            continue
        print(f"\n== '{cat}' top events (summed ms, xN occurrences) ==")
        evs = sorted(by_cat_event[cat].items(), key=lambda kv: -kv[1][0])
        for k, (ms, n) in evs[:12]:
            print(f"  {ms:9.1f} x{n:<5d} {k}")


if __name__ == "__main__":
    main()
