#!/usr/bin/env python
"""Trivial-baseline error floors on a dataset.

Two baselines (counterparts of the reference's ``mean-forecast-errors.py``
and ``gaussian-smoothing-error.py``):

- ``mean``: predict the per-case time-mean flow for every frame
- ``smooth``: predict a Gaussian-smoothed version of the true frame

``python scripts/trivial-baselines.py <data_root> [--split val] [--sigma 1.0]``

Reports per-variable MSE so learned-model errors can be put in context.
"""

import argparse
import json
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--split", default="val")
    ap.add_argument("--sigma", type=float, default=1.0)
    ap.add_argument("--frames", type=int, default=16)
    args = ap.parse_args()

    import numpy as np
    from scipy.ndimage import gaussian_filter

    from generative_turbulence_tpu.data import CaseRepository, Variable, find_data_files

    variables = (Variable.U, Variable.P)
    files = find_data_files(Path(args.data_root) / args.split)
    out = {"mean-forecast": {}, "gaussian-smoothing": {}}

    for file in files:
        repo = CaseRepository([file], variables)
        meta = repo.read_metadata(0)
        n = len(repo.times[0])
        idx = np.round(np.linspace(0, n - 1, min(args.frames, n))).astype(int)
        data = repo.read(0, idx)
        case = meta.case_name

        for v in variables:
            x = data.fields[v]  # (T, N, C)
            mean_pred = x.mean(axis=0, keepdims=True)
            out["mean-forecast"].setdefault(v.key, {})[case] = float(
                ((x - mean_pred) ** 2).mean()
            )

            # Gaussian smoothing on the dense grid per frame/channel.
            X, Y, Z = (int(c) for c in meta.cell_counts)
            dense = np.zeros((len(x), X * Y * Z, x.shape[-1]), dtype=np.float32)
            dense[:, meta.cell_idx] = x
            dense = dense.reshape(len(x), X, Y, Z, -1)
            smoothed = gaussian_filter(
                dense, sigma=(0, args.sigma, args.sigma, args.sigma, 0)
            )
            sm_cells = smoothed.reshape(len(x), -1, x.shape[-1])[:, meta.cell_idx]
            out["gaussian-smoothing"].setdefault(v.key, {})[case] = float(
                ((x - sm_cells) ** 2).mean()
            )

    # Aggregate across cases.
    summary = {
        baseline: {v: float(np.mean(list(cases.values()))) for v, cases in vs.items()}
        for baseline, vs in out.items()
    }
    print(json.dumps({"summary": summary, "per_case": out}, indent=2))


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
