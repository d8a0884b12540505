#!/bin/sh
# Extract downloaded dataset tarballs in place and remove the archives.
# Usage: scripts/extract-dataset.sh <dataset-dir>
set -e
DIR="${1:?usage: extract-dataset.sh <dataset-dir>}"
find "$DIR" -name '*.tar' -print -execdir tar -xf {} \; -delete
find "$DIR" -name '*.tar.gz' -print -execdir tar -xzf {} \; -delete
echo "extracted archives under $DIR"
