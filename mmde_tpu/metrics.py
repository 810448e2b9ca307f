"""Evaluation metrics: depth suite, eval crops, pose MSE + cycle consistency.

Parity targets (formulas) from the reference:
  - eval_depth    utils/metrics.py:9-32  (d1/d2/d3, abs_rel, sq_rel, rmse,
                  rmse_log, log10, silog over flattened valid pixels)
  - cropping_img  utils/metrics.py:35-76 (inf/nan clamp, min/max valid mask,
                  KITTI KB/garg/eigen crops, NYU eval crop rows 45:471 cols
                  41:601)
  - eval_pose     utils/metrics.py:78-122 (pose MSEs + R12·R21≈I and
                  T12 + R12·T21 ≈ 0 identity checks)

Two implementations are provided:
  * masked jit-friendly versions (static shapes, `where` reductions) for
    on-device evaluation;
  - the tests verify them against direct numpy ports using boolean indexing.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

DEPTH_METRIC_NAMES = (
    "d1", "d2", "d3", "abs_rel", "sq_rel", "rmse", "rmse_log", "log10", "silog",
)
POSE_METRIC_NAMES = (
    "pose_mse_r12", "pose_mse_t12", "pose_mse_r21", "pose_mse_t21",
    "pose_mse_r_identity", "pose_mse_t_identity",
)
ALL_METRIC_NAMES = DEPTH_METRIC_NAMES + POSE_METRIC_NAMES


def eval_depth_masked(pred: jnp.ndarray, target: jnp.ndarray,
                      valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Depth metric suite over the pixels where `valid` is True.

    Equal to the reference eval_depth applied to pred[valid], target[valid].
    All inputs broadcastable; returns dict of scalars.
    """
    valid = valid.astype(bool)
    n = jnp.maximum(jnp.sum(valid), 1)
    p = jnp.where(valid, pred, 1.0)
    t = jnp.where(valid, target, 1.0)

    thresh = jnp.maximum(t / p, p / t)
    d1 = jnp.sum(jnp.where(valid, thresh < 1.25, False)) / n
    d2 = jnp.sum(jnp.where(valid, thresh < 1.25 ** 2, False)) / n
    d3 = jnp.sum(jnp.where(valid, thresh < 1.25 ** 3, False)) / n

    diff = jnp.where(valid, p - t, 0.0)
    diff_log = jnp.where(valid, jnp.log(p) - jnp.log(t), 0.0)

    abs_rel = jnp.sum(jnp.where(valid, jnp.abs(diff) / t, 0.0)) / n
    sq_rel = jnp.sum(jnp.where(valid, diff * diff / t, 0.0)) / n
    rmse = jnp.sqrt(jnp.sum(diff * diff) / n)
    rmse_log = jnp.sqrt(jnp.sum(diff_log * diff_log) / n)
    log10 = jnp.sum(jnp.where(
        valid, jnp.abs(jnp.log10(p) - jnp.log10(t)), 0.0)) / n
    mean_dl2 = jnp.sum(diff_log * diff_log) / n
    mean_dl = jnp.sum(diff_log) / n
    silog = jnp.sqrt(jnp.maximum(mean_dl2 - 0.5 * mean_dl * mean_dl, 0.0))

    return {
        "d1": d1, "d2": d2, "d3": d3, "abs_rel": abs_rel, "sq_rel": sq_rel,
        "rmse": rmse, "rmse_log": rmse_log, "log10": log10, "silog": silog,
    }


def eval_depth_masked_per_sample(pred: jnp.ndarray, target: jnp.ndarray,
                                 valid: jnp.ndarray
                                 ) -> Dict[str, jnp.ndarray]:
    """Per-sample depth metric suite: reductions over the pixel axes only.

    Inputs (B, H, W); returns dict of (B,) vectors. Averaging these over
    samples reproduces the reference's protocol exactly (validate runs at
    batch size 1 and averages per-sample metrics, train.py:311-399) while
    letting a sharded eval step process num_devices samples per dispatch.
    Samples with zero valid pixels return 0 in every metric (mask them out
    with a sample-validity weight on the host side).
    """
    ax = tuple(range(1, pred.ndim))
    valid = valid.astype(bool)
    n = jnp.maximum(jnp.sum(valid, axis=ax), 1)
    p = jnp.where(valid, pred, 1.0)
    t = jnp.where(valid, target, 1.0)
    any_valid = jnp.any(valid, axis=ax)

    thresh = jnp.maximum(t / p, p / t)
    d1 = jnp.sum(jnp.where(valid, thresh < 1.25, False), axis=ax) / n
    d2 = jnp.sum(jnp.where(valid, thresh < 1.25 ** 2, False), axis=ax) / n
    d3 = jnp.sum(jnp.where(valid, thresh < 1.25 ** 3, False), axis=ax) / n

    diff = jnp.where(valid, p - t, 0.0)
    diff_log = jnp.where(valid, jnp.log(p) - jnp.log(t), 0.0)

    abs_rel = jnp.sum(jnp.where(valid, jnp.abs(diff) / t, 0.0), axis=ax) / n
    sq_rel = jnp.sum(jnp.where(valid, diff * diff / t, 0.0), axis=ax) / n
    rmse = jnp.sqrt(jnp.sum(diff * diff, axis=ax) / n)
    rmse_log = jnp.sqrt(jnp.sum(diff_log * diff_log, axis=ax) / n)
    log10 = jnp.sum(jnp.where(
        valid, jnp.abs(jnp.log10(p) - jnp.log10(t)), 0.0), axis=ax) / n
    mean_dl2 = jnp.sum(diff_log * diff_log, axis=ax) / n
    mean_dl = jnp.sum(diff_log, axis=ax) / n
    silog = jnp.sqrt(jnp.maximum(mean_dl2 - 0.5 * mean_dl * mean_dl, 0.0))

    out = {
        "d1": d1, "d2": d2, "d3": d3, "abs_rel": abs_rel, "sq_rel": sq_rel,
        "rmse": rmse, "rmse_log": rmse_log, "log10": log10, "silog": silog,
    }
    return {k: jnp.where(any_valid, v, 0.0) for k, v in out.items()}


def eval_pose_per_sample(pred: Dict[str, jnp.ndarray],
                         target: Dict[str, jnp.ndarray]
                         ) -> Dict[str, jnp.ndarray]:
    """Per-sample pose MSEs + cycle-consistency checks ((B,) vectors);
    the batch mean of each equals eval_pose at batch size 1 averaged over
    samples (the reference protocol, metrics.py:78-122)."""
    B = pred["R12"].shape[0]

    def mse(a, b):
        d = a.reshape(B, -1) - b.reshape(B, -1)
        return jnp.mean(d * d, axis=1)

    out = {
        "pose_mse_r12": mse(pred["R12"], target["R12"]),
        "pose_mse_t12": mse(pred["T12"], target["T12"]),
    }
    if pred.get("R21") is None:
        zero = jnp.zeros((B,))
        out.update({
            "pose_mse_r21": zero, "pose_mse_t21": zero,
            "pose_mse_r_identity": zero, "pose_mse_t_identity": zero,
        })
        return out
    out["pose_mse_r21"] = mse(pred["R21"], target["R21"])
    out["pose_mse_t21"] = mse(pred["T21"], target["T21"])
    R12 = pred["R12"].reshape(B, 3, 3)
    R21 = pred["R21"].reshape(B, 3, 3)
    T12 = pred["T12"].reshape(B, 3, 1)
    T21 = pred["T21"].reshape(B, 3, 1)
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    dR = R12 @ R21 - eye
    out["pose_mse_r_identity"] = jnp.mean(dR.reshape(B, -1) ** 2, axis=1)
    dT = (T12 + R12 @ T21).reshape(B, -1)
    out["pose_mse_t_identity"] = jnp.mean(dT * dT, axis=1)
    return out


def eval_mask(dataset: str, pred: jnp.ndarray, gt: jnp.ndarray, *,
              min_depth_eval: float, max_depth_eval: float,
              do_kb_crop: bool = True, kitti_crop: Optional[str] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clamp pred and build the dataset-specific valid mask.

    Mirrors cropping_img (metrics.py:35-76) but as a mask instead of boolean
    indexing so shapes stay static. Returns (pred_clamped, gt, mask).

    Note on KITTI KB-crop: the reference *slices* gt to 352x1216 before
    masking; here the caller is expected to pass already-KB-cropped gt/pred
    (the data pipeline crops), and `kitti_crop` applies the garg/eigen
    sub-region mask.
    """
    pred = jnp.where(jnp.isinf(pred), max_depth_eval, pred)
    pred = jnp.where(jnp.isnan(pred), min_depth_eval, pred)
    valid = (gt > min_depth_eval) & (gt < max_depth_eval)

    H, W = gt.shape[-2], gt.shape[-1]
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]

    if dataset == "kitti" and kitti_crop in ("garg_crop", "eigen_crop"):
        if kitti_crop == "garg_crop":
            r0, r1 = int(0.40810811 * H), int(0.99189189 * H)
        else:
            r0, r1 = int(0.3324324 * H), int(0.91351351 * H)
        c0, c1 = int(0.0359477 * W), int(0.96405229 * W)
        region = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)
        valid = valid & region
    elif dataset == "nyudepthv2":
        # NYU official eval crop (metrics.py:68-70)
        region = (rows >= 45) & (rows < 471) & (cols >= 41) & (cols < 601)
        valid = valid & region
    # 'void' and others: min/max valid mask only.
    return pred, gt, valid


def eval_pose(pred: Dict[str, jnp.ndarray], target: Dict[str, jnp.ndarray]
              ) -> Dict[str, jnp.ndarray]:
    """Pose MSEs + cycle-consistency identity checks (metrics.py:78-122).

    pred/target keys: R12 (B,9 or B,3,3), T12 (B,3), optionally R21/T21.
    When R21 is absent/None, the r21/t21/identity entries are 0 (matching the
    reference's intended single-direction path).
    """
    B = pred["R12"].shape[0]

    def mse(a, b):
        d = a.reshape(B, -1) - b.reshape(B, -1)
        return jnp.mean(d * d)

    out = {
        "pose_mse_r12": mse(pred["R12"], target["R12"]),
        "pose_mse_t12": mse(pred["T12"], target["T12"]),
    }
    if pred.get("R21") is None:
        zero = jnp.zeros(())
        out.update({
            "pose_mse_r21": zero, "pose_mse_t21": zero,
            "pose_mse_r_identity": zero, "pose_mse_t_identity": zero,
        })
        return out

    out["pose_mse_r21"] = mse(pred["R21"], target["R21"])
    out["pose_mse_t21"] = mse(pred["T21"], target["T21"])

    R12 = pred["R12"].reshape(B, 3, 3)
    R21 = pred["R21"].reshape(B, 3, 3)
    T12 = pred["T12"].reshape(B, 3, 1)
    T21 = pred["T21"].reshape(B, 3, 1)
    eye = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    dR = R12 @ R21 - eye
    out["pose_mse_r_identity"] = jnp.mean(dR * dR)
    dT = T12 + R12 @ T21
    out["pose_mse_t_identity"] = jnp.mean(dT * dT)
    return out


# ---------------------------------------------------------------------------
# Host-side numpy reference (boolean indexing, mirrors torch semantics 1:1).
# Used for final-eval reporting and as the oracle in tests.
# ---------------------------------------------------------------------------

def eval_depth_np(pred: np.ndarray, target: np.ndarray) -> Dict[str, float]:
    """Direct numpy port of eval_depth over flattened valid arrays."""
    assert pred.shape == target.shape
    pred = pred.reshape(-1).astype(np.float64)
    target = target.reshape(-1).astype(np.float64)
    thresh = np.maximum(target / pred, pred / target)
    n = len(thresh)
    d1 = float((thresh < 1.25).sum()) / n
    d2 = float((thresh < 1.25 ** 2).sum()) / n
    d3 = float((thresh < 1.25 ** 3).sum()) / n
    diff = pred - target
    diff_log = np.log(pred) - np.log(target)
    abs_rel = float(np.mean(np.abs(diff) / target))
    sq_rel = float(np.mean(diff ** 2 / target))
    rmse = float(np.sqrt(np.mean(diff ** 2)))
    rmse_log = float(np.sqrt(np.mean(diff_log ** 2)))
    log10 = float(np.mean(np.abs(np.log10(pred) - np.log10(target))))
    silog = float(np.sqrt(np.mean(diff_log ** 2) - 0.5 * np.mean(diff_log) ** 2))
    return {"d1": d1, "d2": d2, "d3": d3, "abs_rel": abs_rel, "sq_rel": sq_rel,
            "rmse": rmse, "rmse_log": rmse_log, "log10": log10, "silog": silog}
