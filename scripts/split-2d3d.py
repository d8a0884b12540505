#!/usr/bin/env python
"""Split the 2D/3D regression cases into train/val/test time ranges.

``python scripts/split-2d3d.py <study_root> [--fractions 0.8 0.1 0.1]``

Applies the per-case time-range split to every solved case under
``<study_root>/cases`` (counterpart of the reference's
``split-2d-3d-regression.py``).
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("study_root")
    ap.add_argument("--fractions", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    args = ap.parse_args()

    from generative_turbulence_tpu.toolchain.analysis import split_h5

    root = Path(args.study_root)
    cases = sorted(
        d for d in (root / "cases").iterdir() if (d / "data.h5").is_file()
    )
    if not cases:
        raise SystemExit(f"no converted cases under {root / 'cases'}")
    for case in cases:
        out = split_h5(case / "data.h5", root, fractions=tuple(args.fractions))
        print(f"{case.name}: " + ", ".join(f"{k}={v}" for k, v in out.items()))


if __name__ == "__main__":
    main()
