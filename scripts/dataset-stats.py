#!/usr/bin/env python
"""Compute training-set statistics -> stats.pickle.
``python scripts/dataset-stats.py <data_root>`` (expects root/train/*/data.h5).
(reference: ``scripts/dataset-stats.py``).
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from generative_turbulence_tpu.data.schema import find_data_files
    from generative_turbulence_tpu.toolchain.analysis import dataset_stats

    root = Path(args.data_root)
    files = find_data_files(root / "train")
    out = Path(args.out) if args.out else root / "stats.pickle"
    dataset_stats(files, out)
    print(f"wrote {out} from {len(files)} cases")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
