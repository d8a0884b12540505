#!/usr/bin/env python
"""Headline benchmark: diffusion sampling throughput at the shapes workload.

Protocol (mirrors the reference's sampling-runtime harness,
``scripts/evaluate-runtime.py:63-96``): wall-clock of the denoising chain at
the shapes grid (192x48x48 unpadded -> 194x50x50 padded), diffusion config
dim=32 / 4 U-Net levels / T=500, eval batch 8, on one TPU chip.

Prints ONE JSON line:
    {"metric": "ddim50_samples_per_min", "value": ..., "unit": "samples/min",
     "vs_baseline": ...}

Measurement protocol ("scan-probe", the default): time the REAL sampler scan
— a 16-step probe of the actual ``ddim_sample_loop`` / ``p_sample_loop``
programs (same lax.scan, same BC re-noising, same memory pressure) — and
scale by steps.  The headline number is the recommended serving config:
bf16 compute (sampling quality matches f32 within 0.05% on val/tke; EMA
parameters are timing-equivalent).  f32 and forward-derived values are
recorded as aux for cross-validation; ``--fast`` skips the scan compiles and
reports the forward-derived estimate only (scan overhead beyond the UNet
eval measured < 3%).

``vs_baseline`` compares against an estimated A100 reference throughput of
4.8 samples/min for the reference's DDPM-500 protocol (the repo publishes no
numbers; estimate assumes ~200 ms per batch-8 UNet eval on A100 for the
reference's torch model: 500 evals * 0.2 s = 100 s per 8 samples).  The
reference implements ancestral DDPM only; DDIM-50 is this framework's fast
path and the driver's north-star throughput metric.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_SAMPLES_PER_MIN = 4.8  # estimated A100 DDPM-500 (see module docstring)
SCAN_OVERHEAD = 1.03  # measured scan-step cost vs plain forward (<3%)
PROBE = 16  # sampler-scan probe steps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--fast", action="store_true",
        help="skip the sampler-scan compiles; report fwd-derived numbers only",
    )
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    import jax

    cache_dir = Path(__file__).resolve().parent / ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        print(f"compilation cache unavailable: {e}", file=sys.stderr)

    import jax.numpy as jnp

    from generative_turbulence_tpu.data import GridMap, Variable
    from generative_turbulence_tpu.data.schema import read_metadata
    from generative_turbulence_tpu.data.synthetic import generate_case
    from generative_turbulence_tpu.diffusion import GaussianDiffusion
    from generative_turbulence_tpu.models import Conditioning, DenoisingModel

    import tempfile

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    # Shapes-scale synthetic case (geometry only; field values irrelevant).
    with tempfile.TemporaryDirectory() as tmp:
        file = generate_case(
            Path(tmp) / "bench-case", cell_counts=(192, 48, 48), n_frames=1, seed=0
        )
        meta = read_metadata(file)
        grid = GridMap.from_metadata(meta, (Variable.U, Variable.P))

    batch = args.batch
    timesteps = 500
    model = DenoisingModel(
        out_features=4,
        timesteps=timesteps,
        dim=32,
        u_net_levels=4,
        conditioning=Conditioning(cell_type_embedding_dim=4),
    )
    model16 = model.clone(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (batch, *grid.shape, 4), dtype=jnp.float32)
    t0 = jnp.zeros((batch,), dtype=jnp.int32)
    # jit the init: eager flax init is pathologically slow on remote TPUs
    params = jax.jit(model.init)(rng, x0[:1], t0[:1], grid.cell_types)

    gd = GaussianDiffusion.create(
        beta_schedule="log-snr-linear", timesteps=timesteps, noise_bcs=True
    )

    # NOTE on synchronization: on this remote-TPU backend,
    # jax.block_until_ready does NOT reliably wait for execution — only a
    # value fetch does.  Timed functions therefore return SCALARS and timing
    # brackets a float() fetch.  The repeat statistic is the MINIMUM: the
    # tunnel adds one-sided latency noise (dispatch ~28 ms, occasional
    # multi-second stalls), so the fastest repeat is the best estimator of
    # the true device cost (run-to-run spread of the mean was ~4%).
    def timed(fn, make_inputs, n=3, label=""):
        print(f"{label}: compiling...", file=sys.stderr, flush=True)
        tic = time.perf_counter()
        v = float(fn(*make_inputs(0)))
        print(
            f"{label} compile+first run: {time.perf_counter() - tic:.1f}s (v={v:.4f})",
            file=sys.stderr,
            flush=True,
        )
        best = float("inf")
        for i in range(n):
            tic = time.perf_counter()
            float(fn(*make_inputs(i + 1)))
            best = min(best, time.perf_counter() - tic)
        return best

    def fwd_time(m, label):
        fwd = jax.jit(
            lambda params, x, t, grid: m.apply(params, x, t, grid.cell_types).mean()
        )
        return timed(fwd, lambda i: (params, x0 + i, t0, grid), n=5, label=label)

    def fwd_flops(m):
        """XLA's static FLOP count for one batched forward (HLO cost
        analysis; computed client-side, no device run)."""
        fwd = jax.jit(
            lambda params, x, t, grid: m.apply(params, x, t, grid.cell_types).mean()
        )
        try:
            cost = fwd.lower(params, x0, t0, grid).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0))
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", file=sys.stderr)
            return 0.0

    # Peak dense bf16 matmul throughput of one TPU v5e (v5 lite) chip.  MFU =
    # achieved model FLOPs/s over peak — the absolute utilization number the
    # relative vs_baseline (an A100 self-estimate) cannot give.
    PEAK_BF16_FLOPS = 197e12

    inputs = lambda i: (params, x0, grid, jax.random.PRNGKey(i))  # noqa: E731
    aux = {}

    if args.fast:
        step16 = fwd_time(model16, "unet-fwd-bf16")
        step32 = fwd_time(model, "unet-fwd-f32")
        ddim_s = step16 * SCAN_OVERHEAD * 50
        ddpm_s = step16 * SCAN_OVERHEAD * timesteps
        method = "fwd-derived"
        aux["f32_ddim50_samples_per_min"] = round(
            batch / (step32 * SCAN_OVERHEAD * 50) * 60, 3
        )
    else:
        # Serving config: bf16 compute, the actual sampler scans.
        def ddim_fn_for(m):
            @jax.jit
            def f(params, x0, grid, r):
                def eps_fn(x_t, t):
                    return m.apply(params, x_t, t, grid.cell_types)

                return gd.ddim_sample_loop(
                    eps_fn, x0, grid, r, num_steps=PROBE
                ).mean()

            return f

        @jax.jit
        def ddpm_fn(params, x0, grid, r):
            def eps_fn(x_t, t):
                return model16.apply(params, x_t, t, grid.cell_types)

            return gd.p_sample_loop(eps_fn, x0, grid, r, start_from=PROBE).mean()

        ddim_s = timed(ddim_fn_for(model16), inputs, n=3, label=f"bf16-ddim{PROBE}")
        ddim_s = ddim_s / PROBE * 50
        ddpm_s = timed(ddpm_fn, inputs, n=2, label=f"bf16-ddpm{PROBE}")
        ddpm_s = ddpm_s / PROBE * timesteps
        method = "scan-probe"

        # Cross-check + r01-comparable f32 number (fwd-derived, cheap).
        step16 = fwd_time(model16, "unet-fwd-bf16")
        step32 = fwd_time(model, "unet-fwd-f32")
        aux["bf16_fwd_derived_ddim50_samples_per_min"] = round(
            batch / (step16 * SCAN_OVERHEAD * 50) * 60, 3
        )
        aux["f32_ddim50_samples_per_min"] = round(
            batch / (step32 * SCAN_OVERHEAD * 50) * 60, 3
        )
        aux["scan_overhead_vs_fwd"] = round((ddim_s / 50) / step16, 3)

    # Absolute utilization: one UNet eval's FLOPs over the measured per-step
    # time of the SERVING path (one DDIM scan step = UNet eval + diffusion
    # algebra + BC re-noising), against the chip's bf16 peak.
    flops = fwd_flops(model16)
    if flops > 0:
        if not args.fast:
            step_time = ddim_s / 50
            aux["mfu_ddim_step"] = round(flops / step_time / PEAK_BF16_FLOPS, 4)
        aux["mfu_bf16_fwd"] = round(flops / step16 / PEAK_BF16_FLOPS, 4)
        aux["unet_fwd_tflops_batch8"] = round(flops / 1e12, 3)

    ddpm_tput = batch / ddpm_s * 60.0
    ddim_tput = batch / ddim_s * 60.0

    # Quality-adjusted throughput: the committed sampler-quality sweep
    # (docs/runs/*sampler-sweep*.json, written by scripts/sampler-sweep.py at
    # the best 45-case checkpoint) ranks sampler configs on val/tke against
    # the DDPM-500 reference protocol.  Report throughput at the cheapest
    # config whose val/tke is within 20% of DDPM-500's — the honest serving
    # number when sample-statistics parity matters (the raw ddim50 headline
    # above is quality-UNADJUSTED; see the sweep artifact for the gap).
    _docs = Path(__file__).resolve().parent / "docs/runs"
    sweep_file = _docs / "shapes-diffusion-r5b/sampler-sweep.json"
    if not sweep_file.is_file():
        sweep_file = _docs / "shapes-diffusion-r5/sampler-sweep.json"
    if sweep_file.is_file():
        try:
            sweep = json.loads(sweep_file.read_text())
            anchor = next(r for r in sweep if r["name"].startswith("ddpm500"))
            ok = [
                r for r in sweep
                if r.get("val/tke") is not None
                and r["val/tke"] <= 1.2 * anchor["val/tke"]
            ]
            pick = min(ok, key=lambda r: r["seconds"])
            # Scale the swept config's wall-clock by this bench's measured
            # per-UNet-eval time ratio (sweep ran its own protocol; the name
            # encodes steps: ddpmN / ddimN).
            n_evals = int("".join(c for c in pick["name"].split("-")[0] if c.isdigit()))
            per_eval = (ddpm_s / timesteps) if pick["name"].startswith("ddpm") else (ddim_s / 50)
            if "f32" in pick["name"]:
                per_eval *= step32 / step16
            qa_tput = batch / (per_eval * n_evals) * 60.0
            aux["quality_adjusted_samples_per_min"] = round(qa_tput, 3)
            aux["quality_adjusted_config"] = pick["name"]
            aux["quality_adjusted_val_tke_vs_ddpm500"] = round(
                pick["val/tke"] / anchor["val/tke"], 3
            )
        except Exception as e:
            print(f"quality-adjusted line unavailable: {e}", file=sys.stderr)
    print(
        f"[{method}] ddpm500: {ddpm_s:.2f}s/batch{batch} = {ddpm_tput:.2f} samples/min; "
        f"ddim50: {ddim_s:.2f}s/batch{batch} = {ddim_tput:.2f} samples/min",
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
                    "method": method,
                    "serving_config": "bf16",
                    "ddpm500_samples_per_min": round(ddpm_tput, 3),
                    "ddpm500_seconds_per_batch8": round(ddpm_s, 3),
                    "ddim50_seconds_per_batch8": round(ddim_s, 3),
                    **aux,
                },
            }
        )
    )


if __name__ == "__main__":
    from generative_turbulence_tpu.utils.hostmem import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
