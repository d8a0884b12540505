#!/bin/bash
# DilResNet baseline on the 45-shape mock dataset; the full protocol (and its
# mock-scale adaptations from the reference's shapes experiment) lives in
# config/shapes_dilresnet.yaml.
cd /root/repo
mkdir -p runs/shapes-dilresnet
exec python scripts/train.py config=config/shapes_dilresnet.yaml "$@"
