#!/usr/bin/env bash
# INRIA Holidays: background images for 3DHP green-screen replacement
# (the reference's background source). Any photo collection works --
# pipeline/backgrounds.py just reads a directory of images.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data}
DEST="$DATA_ROOT/backgrounds"
mkdir -p "$DEST"
cd "$DEST"
for part in jpg1 jpg2; do
  wget -c "ftp://ftp.inrialpes.fr/pub/lear/douze/data/${part}.tar.gz" \
    || { echo "fetch ${part}.tar.gz manually (or drop any images into $DEST)"; exit 1; }
  tar -xzf "${part}.tar.gz" --strip-components=1
done
echo "done; background bank loads from $DEST"
