#!/usr/bin/env python
"""Convert a solved OpenFOAM case to data.h5 (+ optional grid embedding).

``python scripts/foam2h5.py <case_dir> [--out data.h5] [--grid-embedding]``
CLI over ``toolchain/convert.py`` (reference: ``scripts/foam2h5.py``).
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("case_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep-first-time", action="store_true")
    ap.add_argument("--grid-embedding", action="store_true")
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()

    from generative_turbulence_tpu.toolchain.convert import (
        add_grid_embedding,
        foam_case_to_h5,
    )

    out = foam_case_to_h5(
        Path(args.case_dir),
        Path(args.out) if args.out else None,
        drop_first_time=not args.keep_first_time,
        n_workers=args.workers,
    )
    print(f"wrote {out}")
    if args.grid_embedding:
        add_grid_embedding(out, Path(args.case_dir))
        print("added grid embedding")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
