"""SO(3)/SE(3) geometry, host (numpy) and in-graph (jax) variants.

Capability parity with the reference's utils/transformation_utils.py:1-51
(skew, exp_so3, log_SO3, SE3 compose/invert, relative pose) and
utils/util.py:5-17 (SVD rotation projection), re-designed so the in-graph
pieces are batched/vmappable jax functions instead of per-sample Python loops.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Host-side (numpy) — used by the data pipeline when building relative poses
# from absolute pose files. Matches reference utils/transformation_utils.py.
# ---------------------------------------------------------------------------

_EPS = 1e-8


def skew(x: np.ndarray) -> np.ndarray:
    """3-vector -> 3x3 skew-symmetric matrix."""
    x = np.asarray(x).reshape(3)
    return np.array([
        [0.0, -x[2], x[1]],
        [x[2], 0.0, -x[0]],
        [-x[1], x[0], 0.0],
    ])


def exp_so3(w: np.ndarray) -> np.ndarray:
    """Rodrigues' formula: axis-angle 3-vector -> rotation matrix.

    Small-angle branch matches reference transformation_utils.py:8-19
    (I + skew(w) for |w| < 1e-8).
    """
    w = np.asarray(w, dtype=np.float64).reshape(3)
    angle = np.linalg.norm(w)
    if abs(angle) < _EPS:
        return np.identity(3) + skew(w)
    axis = w / angle
    K = skew(axis)
    s, c = np.sin(angle), np.cos(angle)
    return c * np.identity(3) + s * K + (1.0 - c) * np.outer(axis, axis)


def log_so3(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle 3-vector (matches log_SO3 ref :21-30)."""
    R = np.asarray(R, dtype=np.float64)
    tr = np.trace(R)
    angle = np.arccos(max(-1.0, min(1.0, 0.5 * (tr - 1.0))))
    if abs(angle) < _EPS:
        W = 0.5 * (R - R.T)
        return np.array([W[2, 1], W[0, 2], W[1, 0]])
    s = np.sin(angle)
    W = (angle / (2.0 * s)) * (R - R.T)
    return np.array([W[2, 1], W[0, 2], W[1, 0]])


def se3(t: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Assemble a 4x4 homogeneous transform from translation + rotation."""
    T = np.zeros((4, 4))
    T[:3, :3] = R
    T[:3, 3] = np.asarray(t).reshape(3)
    T[3, 3] = 1.0
    return T


def inv_se3(T: np.ndarray) -> np.ndarray:
    """Inverse of a 4x4 SE(3) transform."""
    R = T[:3, :3]
    t = T[:3, 3]
    return se3(-R.T @ t, R.T)


def relative_pose(T01: np.ndarray, T02: np.ndarray) -> np.ndarray:
    """Relative SE(3) taking frame-1 coords to frame-2 coords given two
    world poses (tail-to-tail; matches GetRelPose_tail2tail ref :45-51):
    T12 = [R01^T R02 | R01^T (t02 - t01)].
    """
    R01, t01 = T01[:3, :3], T01[:3, 3]
    R02, t02 = T02[:3, :3], T02[:3, 3]
    R10 = R01.T
    return se3(R10 @ (t02 - t01), R10 @ R02)


def relative_pose_parts(T01: np.ndarray, T02: np.ndarray):
    """Relative pose decomposed the way the VOID v3 loader returns it
    (ref dataset/void_dataset_v3.py:107-114): (RT, T(3,1), R(3,3), w(3,1),
    axis_angle(4,1) = [w/|w| ; |w|])."""
    RT = relative_pose(T01, T02)
    T = RT[:3, 3].reshape(3, 1)
    R = RT[:3, :3]
    w = log_so3(R).reshape(3, 1)
    n = np.linalg.norm(w)
    axis_angle = np.concatenate([w / n if n > 0 else w, np.array([[n]])], axis=0)
    return RT, T, R, w, axis_angle


# ---------------------------------------------------------------------------
# In-graph (jax) — batched, jit/vmap friendly.
# ---------------------------------------------------------------------------


def skew_jax(x: jnp.ndarray) -> jnp.ndarray:
    """Batched skew: (..., 3) -> (..., 3, 3)."""
    x0, x1, x2 = x[..., 0], x[..., 1], x[..., 2]
    z = jnp.zeros_like(x0)
    return jnp.stack([
        jnp.stack([z, -x2, x1], axis=-1),
        jnp.stack([x2, z, -x0], axis=-1),
        jnp.stack([-x1, x0, z], axis=-1),
    ], axis=-2)


def exp_so3_jax(w: jnp.ndarray) -> jnp.ndarray:
    """Batched Rodrigues: (..., 3) -> (..., 3, 3).

    Uses a Taylor-safe formulation (sin(x)/x, (1-cos(x))/x^2 with small-angle
    fallbacks) so it is differentiable at w = 0 — the idiomatic jax
    replacement for the reference's python `if angle < eps` branch.
    """
    angle2 = jnp.sum(w * w, axis=-1)
    small = angle2 < 1e-12
    # Both branches of a `where` are evaluated (and differentiated), so the
    # trig branch must see a strictly-positive angle even when w == 0.
    angle2_safe = jnp.where(small, 1.0, angle2)
    angle = jnp.sqrt(angle2_safe)
    # sin(a)/a and (1-cos(a))/a^2, guarded for a -> 0
    A = jnp.where(small, 1.0 - angle2 / 6.0, jnp.sin(angle) / angle)
    B = jnp.where(small, 0.5 - angle2 / 24.0,
                  (1.0 - jnp.cos(angle)) / angle2_safe)
    K = skew_jax(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A[..., None, None] * K + B[..., None, None] * (K @ K)


def log_so3_jax(R: jnp.ndarray) -> jnp.ndarray:
    """Batched SO(3) log: (..., 3, 3) -> (..., 3)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_a = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    angle = jnp.arccos(cos_a)
    W = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    vee = jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)
    s = jnp.sin(angle)
    small = jnp.abs(angle) < 1e-8
    scale = jnp.where(small, 1.0, angle / jnp.maximum(s, 1e-24))
    return scale[..., None] * vee


def normalize_rotation(rot9: jnp.ndarray) -> jnp.ndarray:
    """Project a batch of 9-dim rotation vectors onto (near-)orthonormal
    matrices via SVD: R_hat = U @ Vh, flattened back to 9-dim.

    Matches the reference's normalize_rot_vector (utils/util.py:5-17) which
    computes U @ I @ V with full_matrices=False — i.e. U @ Vh, with no
    det-sign correction (the reference does not force det=+1; we keep that
    semantics for parity). Batched via jnp.linalg.svd instead of a per-sample
    python loop.
    """
    shape = rot9.shape
    R = rot9.reshape(shape[:-1] + (3, 3))
    U, _, Vh = jnp.linalg.svd(R, full_matrices=False)
    R_hat = U @ Vh
    return R_hat.reshape(shape)


def rotation_geodesic_angle(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) between two batches of rotation matrices."""
    M = R1 @ jnp.swapaxes(R2, -1, -2)
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0))
