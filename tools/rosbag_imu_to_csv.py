#!/usr/bin/env python
"""Extract the /camera/imu topic of a VOID raw.bag into the rostopic-echo
CSV layout the loaders consume (capability parity with the reference's
`rostopic echo -b raw.bag -p /camera/imu > raw.csv` shell-out,
dataset/void_dataset_v3.py:52-58 — without requiring a ROS install).

Usage: python tools/rosbag_imu_to_csv.py path/to/raw.bag [out.csv]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mmde_tpu.data.rosbag import convert_bag_to_csv  # noqa: E402


def main():
    bag_path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.splitext(bag_path)[0] + ".csv"
    n = convert_bag_to_csv(bag_path, out_path)
    print(f"wrote {n} IMU rows to {out_path}")


if __name__ == "__main__":
    main()
