"""Test-time augmentation: horizontal-flip averaging and shift-window
evaluation for wide images.

Capability parity with reference test.py:93-115:
  * flip TTA — run the model on the mirrored image and average the
    un-mirrored prediction;
  * shift-window TTA — slide square h x h crops across the width with a
    fixed stride, batch them through the model, and recompose by
    coverage-weighted averaging.

Both are built from one jitted forward; the crop batching is static-shape
(the crop grid depends only on the image size), so each image geometry
compiles once.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def flip_average(forward: Callable[[jnp.ndarray], jnp.ndarray],
                 image: jnp.ndarray) -> jnp.ndarray:
    """forward: (B, H, W, 3) -> (B, H, W, 1) depth. Averages normal and
    mirrored passes (test.py:104-110)."""
    d = forward(image)
    d_flip = forward(image[:, :, ::-1, :])
    return 0.5 * (d + d_flip[:, :, ::-1, :])


def shift_window_positions(width: int, crop: int, stride: int) -> List[int]:
    """Left edges of the sliding crops, always covering the right border."""
    xs = list(range(0, max(width - crop, 0) + 1, stride))
    if xs[-1] != width - crop:
        xs.append(width - crop)
    return xs


def shift_window_eval(forward: Callable[[jnp.ndarray], jnp.ndarray],
                      image: jnp.ndarray, crop: int,
                      stride: int = None) -> jnp.ndarray:
    """Slide (H x crop) windows across the width, average overlapping
    predictions by coverage count (test.py:93-115).

    image: (B, H, W, 3) with H <= crop <= W. Returns (B, H, W, 1).
    """
    B, H, W, _ = image.shape
    stride = stride or crop // 2
    xs = shift_window_positions(W, crop, stride)

    crops = jnp.stack([image[:, :, x:x + crop, :] for x in xs], axis=0)
    crops = crops.reshape(len(xs) * B, H, crop, 3)
    preds = forward(crops)                              # (S*B, H, crop, 1)
    preds = preds.reshape(len(xs), B, H, crop, -1)

    out = jnp.zeros((B, H, W, preds.shape[-1]), preds.dtype)
    count = jnp.zeros((1, 1, W, 1), preds.dtype)
    for i, x in enumerate(xs):
        out = out.at[:, :, x:x + crop, :].add(preds[i])
        count = count.at[:, :, x:x + crop, :].add(1.0)
    return out / count
