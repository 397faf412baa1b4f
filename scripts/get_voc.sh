#!/usr/bin/env bash
# Pascal VOC 2012 (segmented object cutouts for occlusion augmentation;
# pipeline/occluders.py reads VOCdevkit/VOC2012 directly).
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data}
DEST="$DATA_ROOT/voc"
mkdir -p "$DEST"
cd "$DEST"
wget -c http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar
tar -xf VOCtrainval_11-May-2012.tar          # -> VOCdevkit/VOC2012
echo "done; occluder bank loads lazily from $DEST"
