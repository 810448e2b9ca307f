#!/usr/bin/env python
"""Folder inference CLI: run depth prediction over any directory of images
(capability parity with the reference's imagepath dataset + test.py
save-path flow). Uses the single-frame GLPDepth family, or the two-frame
model with each image paired with itself.

Usage:
    python tools/infer.py --images ./photos --out ./depth_out \
        [--config cfg.yaml] [--ckpt run/ckpt] [--colormap]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--colormap", action="store_true",
                   help="also write colormapped panels")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from mmde_tpu.config import Config, load_yaml
    from mmde_tpu.models import build_model
    from mmde_tpu.data.datasets import ImageFolder
    from mmde_tpu.train.step import TrainState, init_model
    from mmde_tpu.utils import viz
    from mmde_tpu.ckpt import orbax_io

    cfg = load_yaml(args.config) if args.config else Config()
    model = build_model(cfg.model)
    ds = ImageFolder(args.images)
    if len(ds) == 0:
        print("no images found")
        return
    os.makedirs(args.out, exist_ok=True)

    sample = ds[0]
    img = jnp.asarray(sample["image"])[None]
    batch = {"image1": img, "image2": img}
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), batch)
    state = TrainState.create(params, batch_stats, optax.identity(),
                              jax.random.PRNGKey(0))
    if args.ckpt:
        state, ep = orbax_io.restore(args.ckpt, state)
        print(f"restored epoch {ep}")

    @jax.jit
    def forward(variables, im):
        out = model.apply(variables, im, im, False)
        return out["pred_d1"]

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for i in range(len(ds)):
        s = ds[i]
        im = jnp.asarray(s["image"])[None]
        depth = np.asarray(forward(variables, im))[0, ..., 0]
        stem = os.path.splitext(s["filename"])[0]
        viz.save_depth_png16(os.path.join(args.out, stem + ".png"), depth,
                             cfg.data.dataset)
        if args.colormap:
            import cv2
            cv2.imwrite(os.path.join(args.out, stem + "_color.png"),
                        viz.colorize_depth(depth))
        print(f"[{i + 1}/{len(ds)}] {s['filename']}")


if __name__ == "__main__":
    main()
