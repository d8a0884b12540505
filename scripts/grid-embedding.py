#!/usr/bin/env python
"""Add the sparse<->dense grid mapping (grid/ + geometry/ groups) to a
converted case.  ``python scripts/grid-embedding.py <data.h5> <case_dir>``
(reference: ``scripts/grid-embedding.py``).
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("h5_file")
    ap.add_argument("case_dir")
    args = ap.parse_args()

    from generative_turbulence_tpu.toolchain.convert import add_grid_embedding

    add_grid_embedding(Path(args.h5_file), Path(args.case_dir))
    print(f"updated {args.h5_file}")


if __name__ == "__main__":
    main()
