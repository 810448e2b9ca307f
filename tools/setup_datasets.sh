#!/usr/bin/env bash
# Dataset acquisition + layout (capability parity with the reference's
# dataset/void_dataset/bash/setup_dataset_void.sh, setup_dataset_void_raw.sh
# and dataset_setting.sh, minus the ROS dependency: the VOID IMU rosbag ->
# CSV conversion is replaced by tools/rosbag_imu_to_csv.py, and all layout
# assumptions live in mmde_tpu/data/*).
#
# Expected final layout under $DATA_ROOT:
#   nyu_depth_v2/                 per-scene rgb_*.jpg + sync_depth_*.png
#     official_splits/test/...    (tools/extract_nyu_mat.py produces both)
#   kitti/                        raw sequences + annotated depth maps
#   void-dataset/data/
#     void_release/void_1500/data/<scene>/{image,ground_truth,absolute_pose,
#                                          sparse_depth,validity_map,K.txt}
#     void_raw/<scene>/raw.csv    (IMU stream; converted from raw.bag)
#
# This container has no network egress; on a connected machine:
set -euo pipefail
DATA_ROOT=${1:-/data}

echo "== VOID release (https://github.com/alexklwong/void-dataset) =="
echo "gdown the release zips listed in the VOID repo, then:"
echo "  unzip void_1500.zip -d $DATA_ROOT/void-dataset/data/void_release/"

echo "== VOID raw (IMU) =="
echo "download raw sequence zips; for each scene convert the rosbag:"
echo "  python tools/rosbag_imu_to_csv.py <scene>/raw.bag   # writes raw.csv"

echo "== NYU Depth V2 =="
echo "  wget http://horatio.cs.nyu.edu/mit/silberman/nyu_depth_v2/nyu_depth_v2_labeled.mat"
echo "  wget .../splits.mat"
echo "  python tools/extract_nyu_mat.py nyu_depth_v2_labeled.mat splits.mat $DATA_ROOT/nyu_depth_v2"

echo "== KITTI (Eigen benchmark) =="
echo "  download raw synced+rectified sequences and annotated depth maps"
echo "  per dataset/filenames/eigen_benchmark lists in the reference repo"
