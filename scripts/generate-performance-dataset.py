#!/usr/bin/env python
"""Generate the solver-scaling study: the same case at several MPI
decomposition widths (counterpart of the reference's
``generate-performance-dataset.py``: parallel in {1, 2, 4, 8, 16}).

``python scripts/generate-performance-dataset.py <out_root> [--widths 1 2 4 8 16]``
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_root")
    ap.add_argument("--widths", nargs="+", type=int, default=[1, 2, 4, 8, 16])
    ap.add_argument("--end-time", type=float, default=0.05)
    args = ap.parse_args()

    from generative_turbulence_tpu.toolchain.generate import ChannelConfig, generate_case
    from generative_turbulence_tpu.toolchain.shapes import shape_boxes, shape_catalog

    holes = shape_boxes(shape_catalog()["square-medium"])
    for width in args.widths:
        config = ChannelConfig(
            holes=holes, n_subdomains=width, end_time=args.end_time
        )
        case_dir = Path(args.out_root) / "cases" / f"parallel-{width}"
        generate_case(case_dir, config)
        print(f"generated parallel-{width}")


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
