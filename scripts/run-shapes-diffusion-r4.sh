#!/bin/bash
# Long 45-shape diffusion run, round-4 recipe: bf16+remat training, f32+
# envelope-clip DDIM-50 in-run monitor (the sampler-sweep-validated eval
# config), EMA 0.999 with warm-up, device-resident training frames.
# LR horizon = 200 epochs x 54 steps/epoch = 10800 steps ~ 3.3 h.
cd /root/repo
mkdir -p runs/shapes-diffusion-r4
exec python scripts/train.py model=diffusion data.root=data/shapes-mock \
  data.device_cache_gb=4 \
  model.compute_dtype=bfloat16 \
  model.eval_compute_dtype=float32 \
  model.ema_decay=0.999 \
  model.sampler=ddim model.ddim_steps=50 \
  model.clip_denoised=true model.clip_mode=envelope \
  trainer.max_epochs=200 \
  trainer.check_val_every_n_epoch=16 \
  trainer.checkpoint_every_n_epochs=16 \
  trainer.out_dir=runs/shapes-diffusion-r4 \
  trainer.train_limit=210m \
  "$@"
