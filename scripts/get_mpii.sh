#!/usr/bin/env bash
# MPII Human Pose (2D auxiliary supervision).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data}
DEST="$DATA_ROOT/mpii"
mkdir -p "$DEST"
cd "$DEST"
wget -c https://datasets.d2.mpi-inf.mpg.de/andriluka14cvpr/mpii_human_pose_v1.tar.gz
wget -c https://datasets.d2.mpi-inf.mpg.de/andriluka14cvpr/mpii_human_pose_v1_u12_2.zip
tar -xzf mpii_human_pose_v1.tar.gz          # -> images/
unzip -o mpii_human_pose_v1_u12_2.zip        # -> mpii_human_pose_v1_u12_1.mat
echo "done; now: python scripts/prepare_mpii.py --data-root $DATA_ROOT"
