"""Host->device transfer benchmark: fp32 vs uint8 image shipping.

Measures device_put of the flagship training batch (two 480x640 RGB frames
+ depths + poses at the given batch size) with float32 images vs uint8
images (AugmentPolicy output_dtype / DataConfig.ship_uint8) — the binding
term for real multi-host input pipelines (reference boundary being
improved: train.py:205-212 per-tensor .to(device)).

Usage: python tools/bench_h2d.py [--batch 8] [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def batch_dict(B, H, W, uint8_images):
    rng = np.random.default_rng(0)
    img = (np.round(rng.random((B, H, W, 3), dtype=np.float32) * 255)
           .astype(np.uint8))
    if not uint8_images:
        img = img.astype(np.float32) / 255.0
    return {
        "image1": img, "image2": img.copy(),
        "depth1": rng.random((B, H, W), dtype=np.float32),
        "depth2": rng.random((B, H, W), dtype=np.float32),
        "R12": rng.random((B, 3, 3), dtype=np.float32),
        "T12": rng.random((B, 3), dtype=np.float32),
        "R21": rng.random((B, 3, 3), dtype=np.float32),
        "T21": rng.random((B, 3), dtype=np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mmde_tpu.train.step import _image

    print(f"backend={jax.default_backend()} batch={args.batch}")
    for label, u8 in (("fp32", False), ("uint8", True)):
        b = batch_dict(args.batch, 480, 640, u8)
        nbytes = sum(v.nbytes for v in b.values())

        def ship(b=b):
            d = jax.device_put(b)
            # include the on-device normalize so uint8 pays its fair cost
            out = jax.tree.map(_image, d)
            jax.block_until_ready(out)
            return out

        out = ship()
        float(jnp.sum(out["image1"][0, 0, 0]))      # remote-tunnel sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = ship()
        float(jnp.sum(out["image1"][0, 0, 0]))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {label:6s} {nbytes / 1e6:7.1f} MB/batch  "
              f"{ms:8.2f} ms/batch  {nbytes / 1e6 / ms:6.2f} GB/s")


if __name__ == "__main__":
    main()
