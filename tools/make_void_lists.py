#!/usr/bin/env python
"""Generate VOID train/test image lists from the release layout.

The reference ships fixed 48248/800-line manifests
(dataset/void_dataset/{train,test}_image.txt). When those files aren't
available, this scans void_release/void_1500/data/<scene>/image/ and splits
scenes (default: last N scenes held out for test, like VOID's official
scene-level split convention).

Usage:
    python tools/make_void_lists.py /data/void-dataset/data \
        [--out /data/void-dataset/data/meta] [--test-scenes 8]
"""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_path")
    p.add_argument("--out", default=None)
    p.add_argument("--test-scenes", type=int, default=8)
    args = p.parse_args()

    release = os.path.join(args.data_path, "void_release/void_1500/data")
    out = args.out or os.path.join(args.data_path, "meta")
    os.makedirs(out, exist_ok=True)

    scenes = sorted(os.listdir(release))
    test_set = set(scenes[-args.test_scenes:]) if args.test_scenes else set()

    train_lines, test_lines = [], []
    for scene in scenes:
        img_dir = os.path.join(release, scene, "image")
        if not os.path.isdir(img_dir):
            continue
        for name in sorted(os.listdir(img_dir)):
            line = f"void_release/void_1500/data/{scene}/image/{name}"
            (test_lines if scene in test_set else train_lines).append(line)

    with open(os.path.join(out, "train_image.txt"), "w") as f:
        f.write("\n".join(train_lines))
    with open(os.path.join(out, "test_image.txt"), "w") as f:
        f.write("\n".join(test_lines))
    print(f"wrote {len(train_lines)} train / {len(test_lines)} test lines "
          f"to {out}")
    calib = os.path.join(out, "calibration.json")
    if not os.path.exists(calib):
        print(f"NOTE: place the camera/IMU calibration at {calib} "
              "(the VOID release's calibration.json)")


if __name__ == "__main__":
    main()
