#!/usr/bin/env bash
# KITTI odometry acquisition (color images + ground-truth poses), pruning
# the unlabelled sequences 11-21 — the reference's dataset/data_prep.sh
# recipe. The pre-interpolated 100 Hz IMU .mat files (imus/00-10.mat, key
# 'imu_data_interp') ship with the reference repository's dataset/imus.
#
# For hermetic development without the ~65 GB download, generate a
# synthetic mini-KITTI tree instead:
#   python -c "from ode_vio_tpu.data.synthetic import make_kitti_tree; \
#              make_kitti_tree('./dataset', seqs=('00','05'), n_frames=200)"
set -euo pipefail

DEST=${1:-./dataset}
mkdir -p "$DEST"
cd "$DEST"

wget -c https://s3.eu-central-1.amazonaws.com/avg-kitti/data_odometry_color.zip
wget -c https://s3.eu-central-1.amazonaws.com/avg-kitti/data_odometry_poses.zip
unzip -n data_odometry_color.zip
unzip -n data_odometry_poses.zip
mv -n dataset/* . 2>/dev/null || true
rmdir dataset 2>/dev/null || true

# only sequences 00-10 have ground truth
for SEQ in 11 12 13 14 15 16 17 18 19 20 21; do
  rm -rf "sequences/$SEQ"
done
echo "KITTI odometry ready under $DEST"
