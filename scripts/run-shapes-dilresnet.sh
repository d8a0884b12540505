#!/bin/bash
# DilResNet baseline on the 45-shape mock dataset (reference protocol:
# config/model/dilresnet.yaml shapes_* fields + shapes_regression_experiment
# sample/main step 24; delta prediction, 4 epochs, batch 3).
cd /root/repo
mkdir -p runs/shapes-dilresnet
exec python scripts/train.py model=dilresnet data.root=data/shapes-mock \
  data.discard_first_seconds=-1 \
  data.device_cache_gb=6 data.eval_device_cache_gb=2 \
  data.eval_batch_size=1 \
  model.monitor=val/tke \
  model.compute_dtype=bfloat16 \
  model.sample_steps=[24] model.main_sample_step=24 \
  trainer.check_val_every_n_epoch=1 \
  trainer.out_dir=runs/shapes-dilresnet \
  trainer.train_limit=100m \
  "$@"
