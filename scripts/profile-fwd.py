#!/usr/bin/env python
"""Attribute device time of the flagship UNet forward / DDIM scan step.

Profiles the bench workload (shapes grid 194x50x50, dim=32, 4 levels,
batch 8, bf16 — ``bench.py``'s protocol, reference
``scripts/evaluate-runtime.py:63-96``) with ``jax.profiler``, parses the
written ``.xplane.pb`` directly, and prints per-category device time
(conv/GN fusions, plain fusions, LAYOUT COPIES, GN-apply, ...) plus the
top individual fusions.  Optionally dumps the compiled HLO so fusion names
can be mapped back to producing ops (``--hlo out.txt``).

    python scripts/profile-fwd.py [--mode fwd|ddim] [--iters 10] [--hlo hlo.txt]

Owns the TPU for ~1-3 min. The xplane parse uses the TF profiler protobuf
shipped with the baked-in tensorflow; no TF runtime is initialized.
"""

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def parse_xplane(profile_dir: Path):
    """Sum event durations by name on TPU device planes. Returns
    {plane_name: {event_name: total_ps}}."""
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # proto moved to tsl in newer TF wheels
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(profile_dir.rglob("*.xplane.pb"))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {profile_dir}")
    space = xplane_pb2.XSpace()
    space.ParseFromString(paths[-1].read_bytes())
    out = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name:
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        sums = defaultdict(int)
        for line in plane.lines:
            # XLA Modules / XLA Ops / XLA TraceMe lines; op-level line has
            # the per-fusion events.
            if line.name not in ("XLA Ops", "XLA TraceMe", "Steps") and "XLA Ops" not in line.name:
                # keep op lines only; module-level would double count
                if "XLA Modules" in line.name or line.name == "Framework Ops":
                    continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                sums[(line.name, name)] += ev.duration_ps
        if sums:
            out[plane.name] = sums
    return out


CATEGORIES = [
    ("conv+GN stats (convert_reduce/conv fusion)", ("convolution", "conv")),
    ("layout copy / transpose", ("copy", "transpose", "bitcast")),
    ("GN apply (divide/multiply)", ("divide", "multiply", "subtract")),
    ("reduce", ("reduce",)),
    ("dynamic slice/update (scan state)", ("dynamic",)),
    ("dot/matmul", ("dot", "gemm")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for label, keys in CATEGORIES:
        if any(k in low for k in keys):
            return label
    if "fusion" in low:
        return "plain fusion"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fwd", choices=["fwd", "ddim"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--hlo", default=None, help="dump compiled HLO text here")
    ap.add_argument("--out", default=None, help="write the category table JSON here")
    ap.add_argument("--probe", type=int, default=8, help="ddim: steps per scan probe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from generative_turbulence_tpu.data import GridMap, Variable
    from generative_turbulence_tpu.data.schema import read_metadata
    from generative_turbulence_tpu.data.synthetic import generate_case
    from generative_turbulence_tpu.diffusion import GaussianDiffusion
    from generative_turbulence_tpu.models import Conditioning, DenoisingModel

    import tempfile

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    with tempfile.TemporaryDirectory() as tmp:
        file = generate_case(
            Path(tmp) / "bench-case", cell_counts=(192, 48, 48), n_frames=1, seed=0
        )
        meta = read_metadata(file)
        grid = GridMap.from_metadata(meta, (Variable.U, Variable.P))

    timesteps = 500
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = DenoisingModel(
        out_features=4,
        timesteps=timesteps,
        dim=32,
        u_net_levels=4,
        conditioning=Conditioning(cell_type_embedding_dim=4),
    ).clone(dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (args.batch, *grid.shape, 4), dtype=jnp.float32)
    t0 = jnp.zeros((args.batch,), dtype=jnp.int32)
    params = jax.jit(model.init)(rng, x0[:1], t0[:1], grid.cell_types)

    if args.mode == "fwd":
        def run(x, t):
            out = model.apply(params, x, t, grid.cell_types)
            return jnp.sum(out[..., :1]).astype(jnp.float32)

        fn = jax.jit(run)
        lowered = fn.lower(x0, t0)
        compiled = lowered.compile()
        inputs = (x0, t0)
        n_unet_per_iter = 1
    else:
        gd = GaussianDiffusion.create(
            beta_schedule="log-snr-linear", timesteps=timesteps, noise_bcs=True
        )

        def eps_fn(x, t):
            return model.apply(params, x, t, grid.cell_types)

        def run(x, key):
            out = gd.ddim_sample_loop(
                eps_fn, x, grid, key, num_steps=args.probe, eta=0.0
            )
            return jnp.sum(out[..., :1]).astype(jnp.float32)

        fn = jax.jit(run)
        key = jax.random.PRNGKey(1)
        lowered = fn.lower(x0, key)
        compiled = lowered.compile()
        inputs = (x0, key)
        n_unet_per_iter = args.probe

    if args.hlo:
        Path(args.hlo).write_text(compiled.as_text())
        print(f"HLO -> {args.hlo}", file=sys.stderr)

    # warm
    float(fn(*inputs))
    prof_dir = Path(tempfile.mkdtemp(prefix="gt-prof-"))
    jax.profiler.start_trace(str(prof_dir))
    tic = time.perf_counter()
    for _ in range(args.iters):
        v = float(fn(*inputs))
    wall = time.perf_counter() - tic
    jax.profiler.stop_trace()
    total_unet = args.iters * n_unet_per_iter
    print(
        f"wall {wall:.3f}s for {args.iters} iters "
        f"({wall / total_unet * 1e3:.1f} ms/UNet-eval incl host)",
        file=sys.stderr,
    )

    planes = parse_xplane(prof_dir)
    result = {"mode": args.mode, "dtype": args.dtype, "batch": args.batch,
              "iters": args.iters, "wall_s": round(wall, 3),
              "ms_per_unet_incl_host": round(wall / total_unet * 1e3, 2)}
    for plane, sums in planes.items():
        # keep only the op-level line with the largest total (avoids module
        # double counting)
        by_line = defaultdict(int)
        for (line, name), ps in sums.items():
            by_line[line] += ps
        op_line = max(by_line, key=by_line.get)
        events = {n: ps for (l, n), ps in sums.items() if l == op_line}
        total_ms = sum(events.values()) / 1e9
        cats = defaultdict(float)
        for n, ps in events.items():
            cats[categorize(n)] += ps / 1e9
        print(f"\n== {plane} (line {op_line!r}): {total_ms:.1f} ms total, "
              f"{total_ms / total_unet:.2f} ms/UNet-eval")
        table = []
        for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            pct = 100 * ms / max(total_ms, 1e-9)
            print(f"  {pct:5.1f}%  {ms / total_unet:7.2f} ms/eval  {c}")
            table.append({"category": c, "pct": round(pct, 1),
                          "ms_per_eval": round(ms / total_unet, 3)})
        print("  top events:")
        top = []
        for n, ps in sorted(events.items(), key=lambda kv: -kv[1])[:20]:
            ms = ps / 1e9
            print(f"    {100 * ms / total_ms:5.1f}%  {ms / total_unet:7.2f} ms/eval  {n[:100]}")
            top.append({"name": n[:200], "pct": round(100 * ms / total_ms, 1),
                        "ms_per_eval": round(ms / total_unet, 3)})
        result[plane] = {"total_ms": round(total_ms, 1), "categories": table,
                         "top_events": top}
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()
    main()
