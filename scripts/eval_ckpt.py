#!/usr/bin/env python
"""Evaluate a checkpoint: sample the val set into an HDF5 store, compute cheap
metrics.  ``python scripts/eval_ckpt.py <ckpt_dir> <out.h5> [key=value ...]``

The config is read from the checkpoint directory (embedded at save time), so
this script is self-contained — the protocol of the reference's
``scripts/eval_ckpt.py:25-80``.
"""

import argparse
import json
import sys
from pathlib import Path

from _common import load_task_from_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="checkpoint dir (containing last/ best/ config.json)")
    ap.add_argument("out_file", help="output samples .h5")
    ap.add_argument("overrides", nargs="*", help="config overrides key=value")
    ap.add_argument("--which", default="best", choices=["best", "last"])
    ap.add_argument("--expensive", action="store_true", help="also run expensive metrics")
    ap.add_argument(
        "--wasserstein-solver", default="exact", choices=["exact", "sinkhorn"],
        help="point-cloud Wasserstein backend: host EMD or on-device "
        "bucketed masked-Sinkhorn (minutes instead of hours at shapes scale)",
    )
    args = ap.parse_args()

    import jax

    from generative_turbulence_tpu.eval.metrics import SampleMetricsCollection
    from generative_turbulence_tpu.eval.sample_store import SampleStore

    config, dm, task, state = load_task_from_checkpoint(
        args.ckpt_dir, args.overrides, args.which
    )

    store = SampleStore(Path(args.out_file), task.variables)
    store.reset()
    rng = jax.random.PRNGKey(config.trainer.seed + 1)
    for i, batch in enumerate(dm.val_batches()):
        print(f"sampling batch {i} ({batch.metadata.case_name})", file=sys.stderr)
        samples = task.sample(state, batch, jax.random.fold_in(rng, i))
        store.add_samples(samples, batch.metadata)

    collection = SampleMetricsCollection(
        "val",
        Path(config.data.root) / "val",
        SampleMetricsCollection.default_metrics(args.wasserstein_solver),
    )
    metrics = collection.compute(store, dm.stats, expensive_metrics=args.expensive)
    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
