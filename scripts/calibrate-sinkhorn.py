#!/usr/bin/env python
"""Calibrate the on-device masked-Sinkhorn Wasserstein against the exact EMD.

At shapes scale (hundreds-to-thousands of regions of up to 512 cells) the
entropic solver (reg = 0.02 * mean cost, 300 iters) is a biased estimator of
the exact transport the reference computes (``turbdiff/models/metrics.py:503-554``).
This script measures that bias on a REAL case: it evaluates the full
``WassersteinMetric`` with both solvers on early-window vs late-window frames
of one case (the data-floor protocol) and records values, relative error,
and wall-clock.

    python scripts/calibrate-sinkhorn.py <data_root> [--case val/block-pair-tall]
        [--samples 8] [--out docs/runs/sinkhorn-calibration.json]
"""

import argparse
import json
import time
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--case", default="val/block-pair-tall")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument(
        "--max-regions",
        type=int,
        default=None,
        help="subsample this many regions (same subset for both solvers) so "
        "the exact host EMD finishes in minutes; weights are renormalized",
    )
    ap.add_argument(
        "--sweep",
        default=None,
        help="comma list of reg:iters pairs (e.g. 0.02:300,0.01:500) — the "
        "exact EMD runs once and every Sinkhorn config is scored against it",
    )
    args = ap.parse_args()

    import numpy as np

    from generative_turbulence_tpu.data import CaseRepository, Variable
    from generative_turbulence_tpu.data.schema import FieldStats
    from generative_turbulence_tpu.eval.metrics import WassersteinMetric

    root = Path(args.data_root)
    stats = FieldStats.from_file(root / "stats.pickle")
    file = root / args.case / "data.h5"
    repo = CaseRepository([file], (Variable.U, Variable.P))

    n_frames = len(repo.times[0])
    k = args.samples
    early = np.linspace(0, n_frames // 2 - 1, k).round().astype(int).tolist()
    late = (
        np.linspace(n_frames // 2, n_frames - 1, k).round().astype(int).tolist()
    )
    samples = repo.read(0, sorted(set(early)))
    data = repo.read(0, sorted(set(late)))

    results = {"case": args.case, "samples": k, "max_regions": args.max_regions}

    def run(solver, **kw):
        tic = time.time()
        metric = WassersteinMetric(
            max_workers=args.workers,
            solver=solver,
            max_regions=args.max_regions,
            **kw,
        )
        out = metric(samples, data, stats)
        wall = time.time() - tic
        return out.get("wasserstein"), wall

    configs = [(0.02, 300)]
    if args.sweep:
        configs = [
            (float(r), int(n))
            for r, n in (pair.split(":") for pair in args.sweep.split(","))
        ]

    ex, ex_wall = run("exact")
    results["exact"] = {"wasserstein": ex, "seconds": ex_wall}
    print(f"exact: {ex} ({ex_wall:.0f}s)", flush=True)

    results["sinkhorn"] = []
    for reg, iters in configs:
        sk, wall = run("sinkhorn", sinkhorn_reg=reg, sinkhorn_iters=iters)
        entry = {
            "reg": reg,
            "iters": iters,
            "wasserstein": sk,
            "seconds": wall,
            "relative_error": abs(sk - ex) / abs(ex) if ex else None,
        }
        results["sinkhorn"].append(entry)
        print(
            f"sinkhorn reg={reg} iters={iters}: {sk} ({wall:.0f}s) "
            f"rel_err={entry['relative_error']:.4f}",
            flush=True,
        )

    out_path = Path(args.out) if args.out else Path("docs/runs/sinkhorn-calibration.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(results, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
