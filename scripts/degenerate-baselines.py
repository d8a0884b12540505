#!/usr/bin/env python
"""Metric-discrimination check: degenerate samplers through the REAL metric
stack.

Three deliberately bad "models" are scored with the exact validation
protocol (``SampleMetricsCollection``, 2nd-half GT — reference protocol
``turbdiff/models/metrics.py:122-195``), alongside the GT floor from
``scripts/evaluate-dataset.py``:

- ``mean``: every sample is the case's first-half time-mean flow (a model
  that collapsed to the mean; zero resolved TKE)
- ``noise``: per-variable moment-matched white noise (a model that learned
  one-point statistics but no structure)
- ``cross-case``: real frames from a DIFFERENT val case (right statistics,
  wrong geometry — tests per-case discrimination)

A healthy metric stack must rank floor < trained model < cross-case < mean
(and noise far off).  Counterpart of the reference's trivial baselines
(``scripts/mean-forecast-errors.py``, ``scripts/gaussian-smoothing-error.py``)
lifted from MSE to the monitored val/tke metric.

``python scripts/cpu-run.py scripts/degenerate-baselines.py <data_root>``
"""

import argparse
import json
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401  (sys.path bootstrap)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--split", default="val")
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import tempfile

    import numpy as np

    from generative_turbulence_tpu.data import (
        CaseRepository,
        Variable,
        find_data_files,
    )
    from generative_turbulence_tpu.data.schema import FieldStats
    from generative_turbulence_tpu.eval.metrics import SampleMetricsCollection
    from generative_turbulence_tpu.eval.sample_store import SampleStore

    root = Path(args.data_root)
    variables = (Variable.U, Variable.P)
    stats = FieldStats.from_file(root / "stats.pickle")
    files = find_data_files(root / args.split)
    rng = np.random.default_rng(args.seed)

    # First-half frames per case: the metric protocol holds out the 2nd half
    # as GT, so baselines may only look at the 1st half.
    firsthalf = {}
    metas = {}
    for i, file in enumerate(files):
        repo = CaseRepository([file], variables)
        meta = repo.read_metadata(0)
        n = len(repo.times[0])
        idx = np.round(np.linspace(0, n // 2 - 1, args.samples)).astype(int)
        data = repo.read(0, sorted(set(idx.tolist())))
        firsthalf[i] = data.stacked_cells(variables)  # (T, N, F)
        metas[i] = meta

    def make_store(tmp, name, sample_fn):
        store = SampleStore(Path(tmp) / f"{name}.h5", variables)
        for i in range(len(files)):
            store.add_samples(sample_fn(i), metas[i])
        return store

    def mean_samples(i):
        x = firsthalf[i]
        return np.repeat(x.mean(axis=0, keepdims=True), args.samples, axis=0)

    def noise_samples(i):
        x = firsthalf[i]
        mu = x.mean(axis=(0, 1), keepdims=True)
        sd = x.std(axis=(0, 1), keepdims=True)
        return (mu + sd * rng.standard_normal((args.samples,) + x.shape[1:])).astype(
            np.float32
        )

    def cross_case_samples(i):
        j = (i + 1) % len(files)
        x = firsthalf[j]
        n_i = firsthalf[i].shape[1]
        if x.shape[1] == n_i:
            return x[: args.samples]
        # Different geometries have different cell counts: tile/trim the
        # donor case's cells onto this case's cell table (still "plausible
        # flow, wrong geometry").
        reps = -(-n_i // x.shape[1])
        return np.tile(x, (1, reps, 1))[: args.samples, :n_i]

    out = {}
    baselines = {
        "mean": mean_samples,
        "noise": noise_samples,
        "cross-case": cross_case_samples,
    }
    for name, fn in baselines.items():
        with tempfile.TemporaryDirectory() as tmp:
            store = make_store(tmp, name, fn)
            collection = SampleMetricsCollection(
                name, root / args.split, SampleMetricsCollection.default_metrics()
            )
            metrics = collection.compute(store, stats, expensive_metrics=False)
        out[name] = metrics
        print(f"{name}: tke={metrics.get(name + '/tke')}", flush=True)

    path = Path(args.out) if args.out else Path("docs/runs/degenerate-baselines.json")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
