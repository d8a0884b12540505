#!/bin/bash
# Round-5 45-shape diffusion run: the r4 recipe (bf16+remat training,
# f32+envelope-clip DDIM-50 in-run monitor, EMA 0.999 warm-up, micro-batch 3
# x accumulate 2, device-resident bf16 train frames) with a longer budget.
# The r4 session ended at update 1728/8640 (val/tke 51.4, one validation);
# overfit-4case scaling suggests the below-white-noise regime needs >> 320
# updates/train-case, so r5 budgets ~220 min of stepping+validation and runs
# a mid-flight kill/resume soak (bit-exact resume, tests/test_resume.py).
#
# The final validation (train-limit stop or max_epochs) runs expensive
# metrics: val/wasserstein via the calibrated on-device Sinkhorn (the
# in-training default since r4).
#
# Validation cadence: every 5 epochs (~8 validations) — the DDIM-50 f32
# monitor costs ~5 min/validation at 9 cases and counts toward train_limit.
cd /root/repo
mkdir -p runs/shapes-diffusion-r5
exec python scripts/train.py model=diffusion data.root=data/shapes-mock \
  data.device_cache_gb=2 \
  model.batch_size=6 \
  model.accumulate_steps=2 \
  model.eval_batch_size=6 \
  data.eval_batch_size=6 \
  model.compute_dtype=bfloat16 \
  model.eval_compute_dtype=float32 \
  model.ema_decay=0.999 \
  model.sampler=ddim model.ddim_steps=50 \
  model.clip_denoised=true model.clip_mode=envelope \
  trainer.max_epochs=60 \
  trainer.check_val_every_n_epoch=5 \
  trainer.checkpoint_every_n_epochs=5 \
  trainer.out_dir=runs/shapes-diffusion-r5 \
  trainer.train_limit=220m \
  "$@"
