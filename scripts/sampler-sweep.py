#!/usr/bin/env python
"""A/B-sweep sampling configurations on one checkpoint, one TPU process.

For each override set: restore the checkpoint, sample the val set, compute
the cheap metrics (val/tke & friends) plus fluctuation-amplitude diagnostics
against ground truth. Prints one JSON line per config and writes them all to
--out. Used to anchor DDIM-vs-DDPM / bf16-vs-f32 / clip_denoised quality
(reference protocol: scripts/evaluate-with-precision.py, eval_ckpt.py:25-80).
"""

import argparse
import json
import sys
import time
from pathlib import Path

from _common import load_task_from_checkpoint


def fluct_diagnostics(store_path, data_root):
    """Sample-vs-GT fluctuation std within each metric region (u only)."""
    import h5py
    import numpy as np

    out = {}
    with h5py.File(store_path, "r") as hs:
        for case in hs:
            u_s = hs[case]["data/u"][:]
            case_dir = Path(data_root) / "val" / case
            with h5py.File(case_dir / "data.h5", "r") as h:
                counts = h["grid/cell_counts"][:]
                idx = h["grid/cell_idx"][:]
                n_frames = h["data/u"].shape[0]
                u_g = h["data/u"][n_frames // 2 :]
            mf = case_dir / "mean-flow.h5"
            if mf.is_file():
                with h5py.File(mf, "r") as h:
                    um = h["data/u"][:]
            else:
                um = u_g.mean(0)
            X, Y, Z = (int(c) for c in counts)
            xs = idx // (Y * Z)
            W = min(Y, Z)
            fs, fg = u_s - um, u_g - um
            for region, n in [("front", 3), ("middle", 2), ("back", 1)]:
                m = (xs >= X - n * W) & (xs < X - n * W + W)
                if not m.any():
                    continue
                r = float(fs[:, m].std() / max(fg[:, m].std(), 1e-12))
                out.setdefault(f"fluct-ratio-{region}", []).append(r)
            out.setdefault("mean-err-rms", []).append(
                float(np.sqrt(((u_s.mean(0) - um) ** 2).mean()))
            )
    import numpy as np

    return {k: float(np.mean(v)) for k, v in out.items()}


def expensive_pass(store, stats, data_root, k_cases=None):
    """val/wasserstein (calibrated on-device Sinkhorn) over the first
    ``k_cases`` val cases of the store (all when None).  Mirrors
    SampleMetricsCollection.compute's GT protocol: samples vs frames evenly
    spaced over the 2nd half of the simulation (reference:
    turbdiff/models/metrics.py:483-554)."""
    import numpy as np

    from generative_turbulence_tpu.data.schema import CaseRepository
    from generative_turbulence_tpu.eval.metrics import WassersteinMetric

    metric = WassersteinMetric(solver="sinkhorn")
    case_names = list(store.case_names)[: k_cases or None]
    out = {}
    for case_name in case_names:
        tic = time.time()
        repo = CaseRepository(
            [Path(data_root) / "val" / case_name / "data.h5"], store.variables
        )
        samples = store.load_samples(repo.read_metadata(0))
        n_data = len(repo.times[0])
        data_idx = np.round(
            np.linspace(n_data // 2, n_data - 1, num=samples.n_samples)
        ).astype(int)
        data = repo.read(0, data_idx)
        for name, value in metric(samples, data, stats).items():
            out[f"val/{case_name}/{name}"] = float(value)
        print(
            f"[expensive] {case_name}: "
            + json.dumps({k: round(v, 4) for k, v in out.items() if case_name in k})
            + f" ({time.time() - tic:.0f}s)",
            file=sys.stderr,
        )
    w_keys = [k for k in out if k.endswith("/wasserstein")]
    if w_keys:
        out["val/wasserstein"] = float(np.mean([out[k] for k in w_keys]))
        out["val/wasserstein-cases"] = float(len(w_keys))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--which", default="best")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--configs",
        default=None,
        help="JSON list of {name, overrides:[...]}; default = built-in sweep",
    )
    ap.add_argument(
        "--expensive-config",
        default=None,
        metavar="NAME",
        help="also compute the expensive metrics (val/wasserstein via the "
        "calibrated on-device Sinkhorn) on this one config's sample store — "
        "one sampling pass serves both the quality sweep and the expensive "
        "record (reference: turbdiff/models/metrics.py:483-554)",
    )
    ap.add_argument(
        "--expensive-cases",
        type=int,
        default=None,
        metavar="K",
        help="bound the expensive pass to the first K val cases (the "
        "calibrated Sinkhorn costs ~4 min/case at shapes scale); the result "
        "records which cases were included",
    )
    args = ap.parse_args()

    import jax

    from generative_turbulence_tpu.eval.metrics import SampleMetricsCollection
    from generative_turbulence_tpu.eval.sample_store import SampleStore

    if args.configs:
        configs = json.loads(Path(args.configs).read_text())
    else:
        configs = [
            {"name": "ddim50-bf16", "overrides": []},
            {"name": "ddim50-bf16-clip", "overrides": ["model.clip_denoised=true"]},
            {"name": "ddim50-f32", "overrides": ["model.compute_dtype=float32"]},
            {
                "name": "ddim50-f32-clip",
                "overrides": [
                    "model.compute_dtype=float32",
                    "model.clip_denoised=true",
                ],
            },
            {"name": "ddpm500-bf16", "overrides": ["model.sampler=ddpm"]},
            {
                "name": "ddpm500-f32-clip",
                "overrides": [
                    "model.sampler=ddpm",
                    "model.compute_dtype=float32",
                    "model.clip_denoised=true",
                ],
            },
        ]

    results = []
    for spec in configs:
        tic = time.time()
        config, dm, task, state = load_task_from_checkpoint(
            args.ckpt_dir, spec["overrides"], args.which
        )
        store_path = Path(config.trainer.out_dir) / f"sweep-{spec['name']}.h5"
        store = SampleStore(store_path, task.variables)
        store.reset()
        rng = jax.random.PRNGKey(config.trainer.seed + 1)
        for i, batch in enumerate(dm.val_batches()):
            print(
                f"[{spec['name']}] batch {i} ({batch.metadata.case_name})",
                file=sys.stderr,
            )
            samples = task.sample(state, batch, jax.random.fold_in(rng, i))
            store.add_samples(samples, batch.metadata)
        collection = SampleMetricsCollection(
            "val",
            Path(config.data.root) / "val",
            SampleMetricsCollection.default_metrics("sinkhorn"),
        )
        metrics = collection.compute(store, dm.stats, expensive_metrics=False)
        metrics = {k: v for k, v in metrics.items() if k.count("/") == 1}
        if args.expensive_config == spec["name"]:
            # The expensive record (val/wasserstein via the calibrated
            # on-device Sinkhorn) on THIS config's freshly sampled store —
            # one sampling pass serves both the sweep and the record.
            metrics.update(
                expensive_pass(
                    store, dm.stats, Path(config.data.root), args.expensive_cases
                )
            )
        metrics.update(fluct_diagnostics(store_path, config.data.root))
        rec = {
            "name": spec["name"],
            "which": args.which,
            "seconds": round(time.time() - tic, 1),
            **{k: round(float(v), 4) for k, v in metrics.items()},
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    return results


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()
    main()
