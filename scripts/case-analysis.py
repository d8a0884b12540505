#!/usr/bin/env python
"""Per-case analysis aux files: mean flow, homogeneous regions, max-mean-TKE,
first turbulent frame, autocorrelation.

``python scripts/case-analysis.py <data.h5> [--all | --mean-flow --regions ...]``

One CLI over the analysis module (reference scripts: mean-flow.py,
homogeneous-regions.py, max-mean-tke.py, first-turbulent-frame.py,
autocorrelation.py).
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_file")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--mean-flow", action="store_true")
    ap.add_argument("--regions", action="store_true")
    ap.add_argument("--max-mean-tke", action="store_true")
    ap.add_argument("--first-turbulent-frame", action="store_true")
    ap.add_argument("--autocorrelation", action="store_true")
    ap.add_argument("--discard", type=float, default=0.025)
    ap.add_argument("--k", type=int, default=64, help="number of regions")
    args = ap.parse_args()

    from generative_turbulence_tpu.toolchain import analysis

    f = Path(args.data_file)
    if args.all or args.mean_flow:
        out = analysis.mean_flow(f, discard_first_seconds=args.discard)
        print(f"mean flow -> {out}")
    if args.all or args.regions:
        a = analysis.homogeneous_regions(
            f, k=args.k, discard_first_seconds=args.discard
        )
        print(f"regions -> {f.parent / 'regions.npz'} ({a.max() + 1} clusters)")
    if args.all or args.max_mean_tke:
        v = analysis.max_mean_tke(f, discard_first_seconds=args.discard)
        print(f"max-mean-tke position: {v}")
    if args.all or args.first_turbulent_frame:
        v = analysis.first_turbulent_frame(f)
        print(f"first turbulent frame: {v}")
    if args.all or args.autocorrelation:
        v = analysis.autocorrelation(f, discard_first_seconds=args.discard)
        print(f"decorrelation steps: {v}")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
