"""Visualization artifacts: depth colormap panels, pose txt dumps, 16-bit
depth PNG export (capability parity with reference utils/viz_utils.py and
the eval-PNG export at test.py:125-137).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:
    import cv2
except Exception:                                    # pragma: no cover
    cv2 = None


def colorize_depth(depth: np.ndarray, max_val: Optional[float] = None,
                   colormap: int = None) -> np.ndarray:
    """Depth (H, W) -> uint8 BGR rainbow colormap."""
    if max_val is None:
        max_val = max(float(depth.max()), 1e-6)
    d8 = np.clip(depth / max_val * 255.0, 0, 255).astype(np.uint8)
    cm = cv2.COLORMAP_RAINBOW if colormap is None else colormap
    return cv2.applyColorMap(d8, cm)


def error_map(gt: np.ndarray, pred: np.ndarray,
              max_val: Optional[float] = None) -> np.ndarray:
    if max_val is None:
        max_val = max(float(gt.max()), float(pred.max()), 1e-6)
    g8 = np.clip(gt / max_val * 255.0, 0, 255).astype(np.uint8)
    p8 = np.clip(pred / max_val * 255.0, 0, 255).astype(np.uint8)
    err = np.abs(g8.astype(np.int16) - p8.astype(np.int16)).astype(np.uint8)
    return cv2.applyColorMap(err, cv2.COLORMAP_WINTER)


def save_comparison_panel(save_dir: str, filename: str,
                          image1: np.ndarray, image2: np.ndarray,
                          gt1: np.ndarray, gt2: np.ndarray,
                          pred1: np.ndarray, pred2: np.ndarray) -> str:
    """Stacked panel: frames / GT depths / predictions / error maps, with
    separator bars (capability of Visualize_CV, viz_utils.py:25-66)."""
    os.makedirs(save_dir, exist_ok=True)
    vmax = max(float(pred1.max()), float(pred2.max()), 1e-6)

    def to_bgr(img):
        u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        return cv2.cvtColor(u8, cv2.COLOR_RGB2BGR)

    rows = [
        np.hstack([to_bgr(image1), to_bgr(image2)]),
        np.hstack([colorize_depth(gt1, vmax), colorize_depth(gt2, vmax)]),
        np.hstack([colorize_depth(pred1, vmax), colorize_depth(pred2, vmax)]),
        np.hstack([error_map(gt1, pred1, vmax), error_map(gt2, pred2, vmax)]),
    ]
    sep = np.full((4, rows[0].shape[1], 3), 255, np.uint8)
    panel = rows[0]
    for r in rows[1:]:
        panel = np.vstack([panel, sep, r])
    out_path = os.path.join(save_dir, filename if filename.endswith(".png")
                            else filename + ".png")
    cv2.imwrite(out_path, panel)
    return out_path


def save_pose_txt(save_dir: str, filename: str,
                  R_gt: np.ndarray, R_pred: np.ndarray,
                  T_gt: np.ndarray, T_pred: np.ndarray) -> str:
    """GT-vs-pred 3x4 pose matrices to txt (viz_utils.py:68-84)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, filename if filename.endswith(".txt")
                        else filename + ".txt")
    gt = np.hstack([np.asarray(R_gt).reshape(3, 3),
                    np.asarray(T_gt).reshape(3, 1)])
    pr = np.hstack([np.asarray(R_pred).reshape(3, 3),
                    np.asarray(T_pred).reshape(3, 1)])
    with open(path, "w") as f:
        f.write("# ground truth [R|T]\n")
        np.savetxt(f, gt, fmt="%.8f")
        f.write("# prediction [R|T]\n")
        np.savetxt(f, pr, fmt="%.8f")
    return path


def save_depth_png16(path: str, depth_m: np.ndarray, dataset: str) -> None:
    """16-bit depth PNG export: x256 KITTI / x1000 others (test.py:125-137)."""
    scale = 256.0 if dataset == "kitti" else 1000.0
    out = (np.asarray(depth_m) * scale).astype(np.uint16)
    cv2.imwrite(path, out, [cv2.IMWRITE_PNG_COMPRESSION, 0])
