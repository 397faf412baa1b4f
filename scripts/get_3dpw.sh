#!/usr/bin/env bash
# 3DPW (multi-person in-the-wild eval). Registration required.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data}
DEST="$DATA_ROOT/3dpw"
mkdir -p "$DEST"
if [ ! -d "$DEST/sequenceFiles" ]; then
  cat <<MSG
3DPW requires registration: https://virtualhumans.mpi-inf.mpg.de/3DPW/
Download imageFiles.zip and sequenceFiles.zip, place them in $DEST, then
re-run this script.
MSG
  if ls "$DEST"/*.zip >/dev/null 2>&1; then
    cd "$DEST"; for z in *.zip; do unzip -o "$z"; done
  else
    exit 1
  fi
fi
echo "done; data/tdpw.py reads $DEST directly (no prepare step)"
