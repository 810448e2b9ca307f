#!/usr/bin/env python
"""Convert the official NYU-Depth-V2 labeled .mat into the per-scene
jpg/png tree the loaders expect (capability parity with reference
utils/extract_official_train_test_set_from_mat.py: per-scene folders,
sync'd rgb jpg + x1000 uint16 depth png, 7-px black border preserved).

Usage: python tools/extract_nyu_mat.py nyu_depth_v2_labeled.mat splits.mat out_dir
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    mat_path, splits_path, out_dir = sys.argv[1:4]

    import h5py
    from scipy.io import loadmat
    import cv2

    h5 = h5py.File(mat_path, "r")
    splits = loadmat(splits_path)
    test_idx = {int(i) for i in splits["testNdxs"].reshape(-1)}

    images = h5["images"]          # (N, 3, W, H)
    depths = h5["depths"]          # (N, W, H)
    names = h5["sceneTypes" if "sceneTypes" in h5 else "scenes"]

    def scene_name(i):
        ref = names[0][i]
        return "".join(chr(c) for c in h5[ref][:].reshape(-1))

    n = images.shape[0]
    for i in range(n):
        split = "test" if (i + 1) in test_idx else "train"
        scene = scene_name(i)
        d = os.path.join(out_dir, split, scene)
        os.makedirs(d, exist_ok=True)

        rgb = np.transpose(images[i], (2, 1, 0))          # H, W, 3
        dep = np.transpose(depths[i], (1, 0))             # H, W

        # 7-px black border as in the official devkit crop convention
        rgb = rgb.copy()
        rgb[:7] = 0
        rgb[-7:] = 0
        rgb[:, :7] = 0
        rgb[:, -7:] = 0

        cv2.imwrite(os.path.join(d, f"rgb_{i:05d}.jpg"),
                    cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(d, f"sync_depth_{i:05d}.png"),
                    (dep * 1000.0).astype(np.uint16))
        if i % 100 == 0:
            print(f"{i}/{n}")
    print("done:", out_dir)


if __name__ == "__main__":
    main()
