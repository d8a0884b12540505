#!/usr/bin/env python
"""Evaluate a checkpoint across matmul precisions (numerical sensitivity of
sampling) — the protocol of the reference's ``scripts/evaluate-with-precision.py``.

``python scripts/evaluate-with-precision.py <ckpt_dir> [--precisions default high highest]``
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
    ap.add_argument(
        "--precisions", nargs="+", default=["default", "high", "highest"]
    )
    args = ap.parse_args()

    import tempfile

    import jax

    from generative_turbulence_tpu.eval.metrics import SampleMetricsCollection
    from generative_turbulence_tpu.eval.sample_store import SampleStore

    results = {}
    for precision in args.precisions:
        if precision != "default":
            jax.config.update("jax_default_matmul_precision", precision)
        config, dm, task, state = load_task_from_checkpoint(
            args.ckpt_dir, args.overrides
        )
        rng = jax.random.PRNGKey(0)
        with tempfile.TemporaryDirectory() as tmp:
            store = SampleStore(Path(tmp) / "samples.h5", task.variables)
            for i, batch in enumerate(dm.val_batches()):
                samples = task.sample(state, batch, jax.random.fold_in(rng, i))
                store.add_samples(samples, batch.metadata)
            collection = SampleMetricsCollection(
                "val",
                Path(config.data.root) / "val",
                SampleMetricsCollection.default_metrics(),
            )
            results[precision] = collection.compute(
                store, dm.stats, expensive_metrics=False
            )
        print(f"{precision}: {results[precision]}", file=sys.stderr)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
