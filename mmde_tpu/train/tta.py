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


def shift_window_eval_two_frame(forward, frame1: jnp.ndarray,
                                frame2: jnp.ndarray, crop: int,
                                stride: int = None) -> Dict[str, jnp.ndarray]:
    """Shift-window TTA for the two-frame family (VERDICT follow-up to
    reference test.py:93-115, which only wires it for single-frame GLPDepth).

    forward: (S*B, H, crop, 3) x2 -> dict with pred_d1/pred_d2
    (S*B, H, crop, 1) and pose outputs (S*B, 9)/(S*B, 3) (r21/t21 may be
    None for decoder_v1). Both frames are cropped in lockstep; depth maps
    are recomposed by coverage-weighted averaging; pose predictions are
    averaged over the windows (chordal mean) and the rotations re-projected
    onto SO(3).
    """
    from mmde_tpu.geometry import normalize_rotation

    B, H, W, _ = frame1.shape
    stride = stride or crop // 2
    xs = shift_window_positions(W, crop, stride)
    S = len(xs)

    c1 = jnp.concatenate([frame1[:, :, x:x + crop, :] for x in xs], axis=0)
    c2 = jnp.concatenate([frame2[:, :, x:x + crop, :] for x in xs], axis=0)
    out = forward(c1, c2)

    res = dict(out)
    for k in ("pred_d1", "pred_d2"):
        if out.get(k) is None:
            continue
        d = out[k].reshape(S, B, H, crop, -1)
        acc = jnp.zeros((B, H, W, d.shape[-1]), d.dtype)
        count = jnp.zeros((1, 1, W, 1), d.dtype)
        for i, x in enumerate(xs):
            acc = acc.at[:, :, x:x + crop, :].add(d[i])
            count = count.at[:, :, x:x + crop, :].add(1.0)
        res[k] = acc / count
    for k in ("pred_r12", "pred_r21"):
        if out.get(k) is not None:
            r = out[k].reshape(S, B, 9).mean(axis=0)
            res[k] = normalize_rotation(r.astype(jnp.float32)).astype(r.dtype)
    for k in ("pred_t12", "pred_t21"):
        if out.get(k) is not None:
            res[k] = out[k].reshape(S, B, -1).mean(axis=0)
    return res
