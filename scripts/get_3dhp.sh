#!/usr/bin/env bash
# MPI-INF-3DHP: the release ships its own downloader. Train set + test set.
set -euo pipefail
DATA_ROOT=${DATA_ROOT:-/data}
DEST="$DATA_ROOT/3dhp/raw"
mkdir -p "$DEST"
cd "$DEST"

# Official downloader bundle (subject to the dataset's license terms).
if [ ! -f mpi_inf_3dhp.zip ]; then
  wget -c http://gvv.mpi-inf.mpg.de/3dhp-dataset/mpi_inf_3dhp.zip \
    || { echo "download failed -- fetch mpi_inf_3dhp.zip manually into $DEST"; exit 1; }
fi
unzip -o mpi_inf_3dhp.zip
# the bundle's own script downloads per-subject sequences + test set; enable
# masks (FGmasks/ChairMasks) in its conf.ig before running:
#   ready_to_download=1, subjects="S1 ... S8", download_masks=1
bash ./get_dataset.sh || true
bash ./get_testset.sh || true
echo "done; now: python scripts/prepare_3dhp.py --data-root $DATA_ROOT"
