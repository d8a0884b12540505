#!/usr/bin/env python
"""Measure sampling wall-clock per case: min over repeats of a full
``task.sample`` call, device-synchronized — the protocol of the reference's
``scripts/evaluate-runtime.py:56-96`` (min wall-clock -> ``sample_time``).

``python scripts/evaluate-runtime.py <ckpt_dir> [key=value ...] [--repeats N]``
"""

import argparse
import json
import sys
import time

import numpy as np

from _common import load_task_from_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--which", default="best", choices=["best", "last"])
    args = ap.parse_args()

    import jax

    config, dm, task, state = load_task_from_checkpoint(
        args.ckpt_dir, args.overrides, args.which
    )

    rng = jax.random.PRNGKey(0)
    times = {}
    for i, batch in enumerate(dm.val_batches()):
        case = batch.metadata.case_name
        if case in times:
            continue
        # Warm-up compiles the sampler for this batch shape.  Synchronize by
        # fetching a VALUE: on the remote-TPU backend jax.block_until_ready
        # does not reliably wait (see CLAUDE.md); task.sample materializes
        # numpy, and the element read below forces full completion.
        float(np.asarray(task.sample(state, batch, rng)).ravel()[0])
        best = float("inf")
        for r in range(args.repeats):
            tic = time.perf_counter()
            out = task.sample(state, batch, jax.random.fold_in(rng, r))
            float(np.asarray(out).ravel()[0])
            best = min(best, time.perf_counter() - tic)
        times[case] = best
        print(f"{case}: {best:.3f}s / batch of {batch.batch_size}", file=sys.stderr)

    sample_time = min(times.values())
    print(json.dumps({"sample_time": sample_time, "per_case": times}))


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
