#!/usr/bin/env python
"""Standalone metric computation on an existing samples file
(``python scripts/sample-metrics.py <samples.h5> <data_dir> [--expensive]``).
Counterpart of the reference's ``scripts/sample-metrics.py:21-38``.
"""

import argparse
import json
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("samples_file")
    ap.add_argument("data_dir", help="directory with <case>/data.h5 + stats.pickle in parent")
    ap.add_argument("--stats", default=None, help="stats.pickle (default: data_dir/../stats.pickle)")
    ap.add_argument("--prefix", default="eval")
    ap.add_argument("--expensive", action="store_true")
    ap.add_argument(
        "--solver",
        default="exact",
        choices=["exact", "sinkhorn"],
        help="Wasserstein solver: 'exact' host EMD (hours at shapes scale) or "
        "the calibrated on-device Sinkhorn (+0.9%%, minutes)",
    )
    args = ap.parse_args()

    from generative_turbulence_tpu.data import Variable
    from generative_turbulence_tpu.data.schema import FieldStats
    from generative_turbulence_tpu.eval.metrics import SampleMetricsCollection
    from generative_turbulence_tpu.eval.sample_store import SampleStore

    data_dir = Path(args.data_dir)
    stats_file = Path(args.stats) if args.stats else data_dir.parent / "stats.pickle"
    stats = FieldStats.from_file(stats_file)

    store = SampleStore(Path(args.samples_file), (Variable.U, Variable.P))
    collection = SampleMetricsCollection(
        args.prefix,
        data_dir,
        SampleMetricsCollection.default_metrics(wasserstein_solver=args.solver),
    )
    metrics = collection.compute(store, stats, expensive_metrics=args.expensive)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
