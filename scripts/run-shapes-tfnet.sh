#!/bin/bash
# TF-Net baseline on the 45-shape mock dataset (reference protocol:
# config/shapes_regression_experiment.yaml at stride 1, adapted to the
# 48-frame mock cases: eval_unroll_steps=30 <= 42 possible windows,
# sample/main step 24 = the reference's max(int(25/stride)-1, 0)).
cd /root/repo
mkdir -p runs/shapes-tfnet
exec python scripts/train.py model=tfnet data.root=data/shapes-mock \
  data.discard_first_seconds=-1 \
  data.device_cache_gb=6 data.eval_device_cache_gb=2 \
  data.eval_batch_size=1 \
  model.monitor=val/tke \
  model.compute_dtype=bfloat16 \
  model.sample_steps=[24] model.main_sample_step=24 \
  trainer.check_val_every_n_epoch=1 \
  trainer.out_dir=runs/shapes-tfnet \
  trainer.train_limit=100m \
  "$@"
