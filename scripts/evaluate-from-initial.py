#!/usr/bin/env python
"""Baseline-only evaluation: unroll the autoregressive model for many steps
from a (noised) initial frame, then compute sample metrics — the protocol of
the reference's ``scripts/evaluate-from-initial.py:66-96``.

``python scripts/evaluate-from-initial.py <ckpt_dir> [--steps 199]``
"""

import argparse
import json
import sys
from pathlib import Path

from _common import load_task_from_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--steps", type=int, default=199)
    ap.add_argument("--noise-std", type=float, default=1e-2)
    ap.add_argument("--block-size", type=int, default=32)
    ap.add_argument("--out", default="from-initial-samples.h5")
    args = ap.parse_args()

    import numpy as np
    import tempfile

    from generative_turbulence_tpu.eval.metrics import SampleMetricsCollection
    from generative_turbulence_tpu.eval.sample_store import SampleStore
    from generative_turbulence_tpu.training.regression_task import RegressionTaskBase

    config, dm, task, state = load_task_from_checkpoint(args.ckpt_dir, args.overrides)
    assert isinstance(task, RegressionTaskBase), "from-initial is baseline-only"

    rng = np.random.default_rng(0)
    store = SampleStore(Path(args.out), task.variables)
    store.reset()
    seen = set()
    for batch in dm.val_batches():
        if batch.metadata.case_name in seen:
            continue
        seen.add(batch.metadata.case_name)
        # noise the initial context to probe robustness
        batch.cells = batch.cells + args.noise_std * rng.normal(
            size=batch.cells.shape
        ).astype(batch.cells.dtype)
        samples = task.unroll_samples(
            state, batch, [args.steps], block_size=args.block_size
        )
        store.add_samples(samples[:, -1], batch.metadata)
        print(f"unrolled {batch.metadata.case_name}", file=sys.stderr)

    collection = SampleMetricsCollection(
        "from-initial",
        Path(config.data.root) / "val",
        SampleMetricsCollection.default_metrics(),
    )
    metrics = collection.compute(store, dm.stats, expensive_metrics=False)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
