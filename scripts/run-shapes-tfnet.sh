#!/bin/bash
# TF-Net baseline on the 45-shape mock dataset; the full protocol (and its
# mock-scale adaptations from the reference's shapes experiment) lives in
# config/shapes_tfnet.yaml.
cd /root/repo
mkdir -p runs/shapes-tfnet
exec python scripts/train.py config=config/shapes_tfnet.yaml "$@"
