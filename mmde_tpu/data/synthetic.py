"""Synthetic in-memory two-frame dataset.

Stands in for NYU/KITTI/VOID in tests and benchmarks (the reference has no
test fixtures at all — SURVEY.md §4): deterministic random RGB pairs, smooth
positive depth maps, and geometrically consistent relative poses
(T21 = inv(T12)), in the exact batch layout the training step consumes.
"""
from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from mmde_tpu import geometry as geo


class SyntheticTwoFrameDataset:
    def __init__(self, num_samples: int = 64, height: int = 96,
                 width: int = 128, max_depth: float = 10.0, seed: int = 0,
                 imu_max_len: int = 32, sparse_depth: bool = False,
                 uint8_images: bool = False, depth_cue: bool = False):
        self.num_samples = num_samples
        self.height = height
        self.width = width
        self.max_depth = max_depth
        self.seed = seed
        self.imu_max_len = imu_max_len
        self.sparse_depth = sparse_depth
        # ship uint8 RGB (device-side normalize; see train/step._image)
        self.uint8_images = uint8_images
        # depth_cue: embed depth/max in the red channel (plus noise) so the
        # depth task is LEARNABLE from RGB — the convergence gate
        # (tools/convergence_gate.py) trains on this and must clear the
        # metric suite on held-out samples. Default synthetic data keeps
        # depth independent of RGB (only memorizable, not learnable).
        self.depth_cue = depth_cue

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        H, W = self.height, self.width

        def smooth_depth():
            base = rng.uniform(0.5, self.max_depth * 0.9,
                               size=(H // 8 + 1, W // 8 + 1)).astype(np.float32)
            if self.depth_cue:
                # BILINEAR upsample for the learnable variant: the default
                # kron (nearest) target has 0.5->9 m jumps at every 8x8
                # block edge that a conv decoder cannot match — measured
                # d1 plateau ~0.46 from edge rings alone (round 5). Smooth
                # targets make d1 -> 1 reachable, which is what the
                # convergence gate thresholds.
                import cv2
                d = cv2.resize(base, (W, H), interpolation=cv2.INTER_LINEAR)
            else:
                d = np.kron(base, np.ones((8, 8), np.float32))[:H, :W]
            mask = rng.random((H, W)) < 0.1   # 10% invalid pixels
            d[mask] = 0.0
            return d

        img1 = rng.random((H, W, 3), dtype=np.float32)
        img2 = np.clip(img1 + rng.normal(0, 0.05, img1.shape), 0, 1).astype(np.float32)
        depth1 = smooth_depth()
        depth2 = smooth_depth()
        if self.depth_cue:
            def cue(img, depth):
                img = img.copy()
                r = (depth / (self.max_depth * 1.1)).astype(np.float32)
                noise = rng.normal(0, 0.01, r.shape).astype(np.float32)
                # invalid (0) pixels keep the random channel — the loss
                # masks them, the model sees them as clutter
                img[..., 0] = np.where(depth > 0,
                                       np.clip(r + noise, 0, 1), img[..., 0])
                return img
            img1 = cue(img1, depth1)
            img2 = cue(img2, depth2)
        if self.uint8_images:
            img1 = np.round(img1 * 255.0).astype(np.uint8)
            img2 = np.round(img2 * 255.0).astype(np.uint8)

        w = rng.standard_normal(3) * 0.1
        t = rng.standard_normal(3) * 0.05
        R12 = geo.exp_so3(w).astype(np.float32)
        T12 = t.astype(np.float32)
        R21 = R12.T.copy()
        T21 = (-R12.T @ t).astype(np.float32)

        n_imu = int(rng.integers(4, self.imu_max_len))
        imu = np.zeros((self.imu_max_len, 7), np.float32)
        imu[:n_imu] = rng.standard_normal((n_imu, 7)).astype(np.float32)
        imu_ts = np.zeros((self.imu_max_len,), np.float32)
        imu_ts[:n_imu] = np.sort(rng.random(n_imu)).astype(np.float32)

        out = {
            "image1": img1, "image2": img2,
            "depth1": depth1, "depth2": depth2,
            "R12": R12, "T12": T12, "R21": R21, "T21": T21,
            "imu_data": imu, "imu_len": np.int32(n_imu),
            "imu_timestamp": imu_ts,
        }
        if self.sparse_depth:
            # VIO-style sparse depth: keep ~5% of valid pixels
            keep1 = rng.random((H, W)) < 0.05
            keep2 = rng.random((H, W)) < 0.05
            out["sparse_depth1"] = np.where(keep1, depth1, 0.0).astype(np.float32)
            out["sparse_depth2"] = np.where(keep2, depth2, 0.0).astype(np.float32)
        return out

    def batches(self, batch_size: int, steps: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield `steps` stacked batches (cycling through samples)."""
        i = 0
        for _ in range(steps):
            items = [self[(i + k) % self.num_samples] for k in range(batch_size)]
            i += batch_size
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
