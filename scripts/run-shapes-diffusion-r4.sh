#!/bin/bash
# Long 45-shape diffusion run, round-4 recipe: bf16+remat training, f32+
# envelope-clip DDIM-50 in-run monitor (the sampler-sweep-validated eval
# config), EMA 0.999 with warm-up, device-resident training frames.
# All 48 mock frames/case survive the 0.025 s discard (stamped past the
# ramp-up window), so an epoch is 432 micro-batches / 216 updates; 40 epochs
# = 8640 updates ~ 3h of stepping fits the 210m limit with ~10 validations.
#
# Batch geometry: batch_size is the EFFECTIVE batch; the factory feeds
# micro-batches of batch/accumulate_steps, so 6/2 = micro-batch 3 (the
# reference's shapes batch 6 preserved).  The single-shot batch-6
# bf16+remat step peaks so
# close to the 16 GB HBM ceiling that adding the ~1.1 GB of device-resident
# bf16 training frames OOMs at step ~50 (measured in this round); halving
# the micro-batch frees the activation headroom and keeps every train frame
# resident.
cd /root/repo
mkdir -p runs/shapes-diffusion-r4
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
  trainer.max_epochs=40 \
  trainer.check_val_every_n_epoch=4 \
  trainer.checkpoint_every_n_epochs=4 \
  trainer.out_dir=runs/shapes-diffusion-r4 \
  trainer.train_limit=210m \
  "$@"
