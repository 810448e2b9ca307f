#!/usr/bin/env python
"""Training CLI (capability parity with reference train.py entry point).

Usage:
    python tools/train.py --config configs/void.yaml
    python tools/train.py --synthetic --epochs 2        # smoke run
    python tools/train.py --config ... --platform cpu   # force CPU
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser(description="mmde_tpu trainer")
    p.add_argument("--config", type=str, default=None,
                   help="YAML config (reference schema accepted)")
    p.add_argument("--synthetic", action="store_true",
                   help="use the in-memory synthetic dataset")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap steps per epoch (smoke runs)")
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--prestage", type=int, default=0,
                   help="measurement mode: pre-stage N device batches and "
                        "cycle them (removes the host producer; see "
                        "train.loop prestage_batches)")
    p.add_argument("--platform", type=str, default=None,
                   help="jax platform override (cpu / tpu)")
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    # persistent compile cache: flagship-size train steps take minutes to
    # compile through the remote TPU tunnel; cached executables make
    # repeat runs start in seconds (same helper bench.py/entry use).
    from mmde_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
        min_compile_secs=0.0)

    import dataclasses
    from mmde_tpu.config import Config, load_yaml

    cfg = load_yaml(args.config) if args.config else Config()
    if args.epochs is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))
    if args.batch_size is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           batch_size=args.batch_size))

    from mmde_tpu.train.loop import train
    result = train(cfg, synthetic=args.synthetic, log_dir=args.log_dir,
                   max_steps_per_epoch=args.max_steps,
                   prestage_batches=args.prestage)
    if result:
        print("final:", {k: round(v, 5) for k, v in result.items()})


if __name__ == "__main__":
    main()
