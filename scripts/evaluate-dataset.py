#!/usr/bin/env python
"""Metric floor: compute the sample metrics with REAL frames as "samples"
(early-window real data vs held-out real data) — what a perfect model would
score.  Protocol of the reference's ``scripts/evaluate-dataset.py:44-74``.

``python scripts/evaluate-dataset.py <data_root> [--split val] [--samples 8]``
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
    ap.add_argument("--expensive", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from generative_turbulence_tpu.data import CaseRepository, Variable, find_data_files
    from generative_turbulence_tpu.data.schema import FieldStats
    from generative_turbulence_tpu.eval.metrics import SampleMetricsCollection
    from generative_turbulence_tpu.eval.sample_store import SampleStore

    root = Path(args.data_root)
    variables = (Variable.U, Variable.P)
    stats = FieldStats.from_file(root / "stats.pickle")
    files = find_data_files(root / args.split)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        store = SampleStore(Path(tmp) / "floor-samples.h5", variables)
        for i, file in enumerate(files):
            repo = CaseRepository([file], variables)
            meta = repo.read_metadata(0)
            n = len(repo.times[0])
            # early window of the developed flow as pseudo-samples
            idx = np.round(np.linspace(n // 4, n // 2 - 1, args.samples)).astype(int)
            data = repo.read(0, idx)
            store.add_samples(data.stacked_cells(variables), meta)

        collection = SampleMetricsCollection(
            "floor", root / args.split, SampleMetricsCollection.default_metrics()
        )
        metrics = collection.compute(store, stats, expensive_metrics=args.expensive)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
