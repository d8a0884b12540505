#!/usr/bin/env python
"""Headline benchmark: diffusion sampling throughput at the shapes workload.

Protocol (mirrors the reference's sampling-runtime harness,
``scripts/evaluate-runtime.py:63-96``): wall-clock of a full ``sample`` call —
grid embedding + normalization + T-step denoising loop + denormalization —
at the shapes grid (192x48x48 unpadded -> 194x50x50 padded), diffusion config
dim=32 / 4 U-Net levels / T=500 DDPM steps, eval batch 8, on one TPU chip.

Prints ONE JSON line:
    {"metric": "ddpm500_samples_per_min", "value": ..., "unit": "samples/min",
     "vs_baseline": ...}

``vs_baseline`` is measured against an estimated A100 reference throughput of
4.8 samples/min for the same DDPM-500 protocol (the repo publishes no numbers;
estimate assumes ~200 ms per batch-8 UNet eval on A100 for the reference's
torch model: 500 evals * 0.2 s = 100 s per 8 samples).  The DDIM-50 figure is
reported as auxiliary output on stderr.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_SAMPLES_PER_MIN = 4.8  # estimated A100 DDPM-500 (see module docstring)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from generative_turbulence_tpu.data import GridMap, Variable
    from generative_turbulence_tpu.data.schema import read_metadata
    from generative_turbulence_tpu.data.synthetic import generate_case
    from generative_turbulence_tpu.diffusion import GaussianDiffusion
    from generative_turbulence_tpu.models import Conditioning, DenoisingModel

    import tempfile

    print(f"devices: {jax.devices()}", file=sys.stderr)

    # Shapes-scale synthetic case (geometry only; field values irrelevant).
    with tempfile.TemporaryDirectory() as tmp:
        file = generate_case(
            Path(tmp) / "bench-case",
            cell_counts=(192, 48, 48),
            n_frames=1,
            seed=0,
        )
        meta = read_metadata(file)
        variables = (Variable.U, Variable.P)
        grid = GridMap.from_metadata(meta, variables)

    batch = 8
    timesteps = 500
    model = DenoisingModel(
        out_features=4,
        timesteps=timesteps,
        dim=32,
        u_net_levels=4,
        conditioning=Conditioning(cell_type_embedding_dim=4),
    )
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (batch, *grid.shape, 4), dtype=jnp.float32)
    t0 = jnp.zeros((batch,), dtype=jnp.int32)
    params = model.init(rng, x0[:1], t0[:1], grid.cell_types)

    gd = GaussianDiffusion.create(
        beta_schedule="log-snr-linear", timesteps=timesteps, noise_bcs=True
    )

    def eps_fn(x_t, t):
        return model.apply(params, x_t, t, grid.cell_types)

    ddpm = jax.jit(lambda r: gd.p_sample_loop(eps_fn, x0, grid, r))
    ddim = jax.jit(
        lambda r: gd.ddim_sample_loop(eps_fn, x0, grid, r, num_steps=50)
    )

    # Compile
    tic = time.perf_counter()
    ddpm(jax.random.PRNGKey(1)).block_until_ready()
    print(f"ddpm compile+first run: {time.perf_counter() - tic:.1f}s", file=sys.stderr)
    tic = time.perf_counter()
    ddim(jax.random.PRNGKey(1)).block_until_ready()
    print(f"ddim compile+first run: {time.perf_counter() - tic:.1f}s", file=sys.stderr)

    def timed(fn, n=2):
        best = float("inf")
        for i in range(n):
            tic = time.perf_counter()
            fn(jax.random.PRNGKey(2 + i)).block_until_ready()
            best = min(best, time.perf_counter() - tic)
        return best

    ddpm_s = timed(ddpm)
    ddim_s = timed(ddim)

    ddpm_tput = batch / ddpm_s * 60.0
    ddim_tput = batch / ddim_s * 60.0
    print(
        f"ddpm500: {ddpm_s:.2f}s/batch{batch} = {ddpm_tput:.2f} samples/min; "
        f"ddim50: {ddim_s:.2f}s/batch{batch} = {ddim_tput:.2f} samples/min",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "ddpm500_samples_per_min",
                "value": round(ddpm_tput, 3),
                "unit": "samples/min",
                "vs_baseline": round(ddpm_tput / BASELINE_SAMPLES_PER_MIN, 3),
                "aux": {
                    "ddim50_samples_per_min": round(ddim_tput, 3),
                    "ddpm500_seconds_per_batch8": round(ddpm_s, 3),
                    "ddim50_seconds_per_batch8": round(ddim_s, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
