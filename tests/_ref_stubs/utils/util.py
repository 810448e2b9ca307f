"""CPU-safe stand-in for the reference utils/util.py (its
normalize_rot_vector hard-codes .cuda(), reference utils/util.py:12).
Identical math: per-sample SVD projection onto SO(3)."""
import torch


def normalize_rot_vector(rot_vector):
    bs, dim = rot_vector.shape
    normed = torch.zeros_like(rot_vector)
    rot = rot_vector.reshape(bs, 3, 3)
    for i in range(bs):
        U, _, V = torch.linalg.svd(rot[i], full_matrices=False)
        normed[i] = (U @ torch.eye(3, dtype=U.dtype) @ V).reshape(-1)
    return normed
