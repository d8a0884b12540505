#!/usr/bin/env python
"""Split one case's data.h5 into train/val/test time ranges.
``python scripts/split-hdf5.py <data.h5> <out_root> [--fractions 0.8 0.1 0.1]``
(reference: ``scripts/split-hdf5.py``).
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_file")
    ap.add_argument("out_root")
    ap.add_argument("--fractions", nargs=3, type=float, default=[0.8, 0.1, 0.1])
    args = ap.parse_args()

    from generative_turbulence_tpu.toolchain.analysis import split_h5

    out = split_h5(
        Path(args.data_file), Path(args.out_root), fractions=tuple(args.fractions)
    )
    for split, path in out.items():
        print(f"{split}: {path}")


if __name__ == "__main__":
    main()
