#!/usr/bin/env bash
# Human3.6M acquisition. The release is licensed: register at
# http://vision.imar.ro/human3.6m/ and download, per subject S1,S5-S9,S11:
#   Videos            (Videos_<S>.tgz)
#   Poses_D3_Positions_mono  (D3 Positions mono, per camera)
#   (optionally) Segments/BBoxes for tighter GT boxes
# plus the camera parameters file (metadata.xml / cameras distributed with
# the toolbox). Place the archives under $DATA_ROOT/h36m/raw/ then run this
# script to extract, and prepare_h36m.py to build annotations.npz.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data}
RAW="$DATA_ROOT/h36m/raw"
mkdir -p "$RAW"

if ! ls "$RAW"/Videos_*.tgz >/dev/null 2>&1; then
  cat <<MSG
No archives found under $RAW.
Human3.6M requires registration; automated download is not possible.
1. Register at http://vision.imar.ro/human3.6m/
2. Download per subject (S1 S5 S6 S7 S8 S9 S11):
     Videos_<S>.tgz and Poses_D3_Positions_mono_<S>.tgz
   and the camera parameter file (metadata.xml).
3. Put them in $RAW and re-run this script.
MSG
  exit 1
fi

for f in "$RAW"/*.tgz; do
  echo "extracting $f"
  tar -xzf "$f" -C "$DATA_ROOT/h36m"
done
echo "done; now: python scripts/prepare_h36m.py --data-root $DATA_ROOT"
