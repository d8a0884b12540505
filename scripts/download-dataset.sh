#!/bin/sh
# Download the published shapes dataset (~2 TB processed HDF5) from the TUM
# mediatum archive (same public source as the reference).
# Usage: scripts/download-dataset.sh <target-dir> [subpath]
set -e
TARGET="${1:?usage: download-dataset.sh <target-dir> [subpath]}"
SUBPATH="${2:-}"
mkdir -p "$TARGET"
rsync -rlptv --info=progress2 \
  "rsync://m1734798@dataserv.ub.tum.de/m1734798/$SUBPATH" "$TARGET/"
echo "done -> $TARGET"
