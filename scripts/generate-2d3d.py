#!/usr/bin/env python
"""Generate the 2D-vs-3D study datasets.

Two modes (counterparts of the reference's ``generate-2d-3d-comparison.py``
and ``generate-2d-3d-regression.py``):

- ``comparison``: one obstacle at several resolutions x {2d, 3d}
- ``regression``: a sweep of inflow velocities x {2d, 3d}

``python scripts/generate-2d3d.py comparison <out_root> [--scales 0.25 0.5 1.0]``
``python scripts/generate-2d3d.py regression <out_root> [--inflows 5 10 ...]``
"""

import argparse
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["comparison", "regression"])
    ap.add_argument("out_root")
    ap.add_argument("--scales", nargs="+", type=float, default=[0.25, 0.5, 0.75, 1.0, 1.25])
    ap.add_argument(
        "--inflows", nargs="+", type=float,
        default=[2.5, 5.0, 7.5, 10.0, 12.5, 15.0, 17.5, 20.0],
    )
    ap.add_argument("--mock-solve", action="store_true")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from generative_turbulence_tpu.toolchain.generate import (
        ChannelConfig,
        generate_case,
        mock_solve,
    )
    from generative_turbulence_tpu.toolchain.shapes import shape_boxes, shape_catalog
    from generative_turbulence_tpu.toolchain.convert import (
        add_grid_embedding,
        foam_case_to_h5,
    )

    root = Path(args.out_root)
    holes = shape_boxes(shape_catalog()["square-medium"])

    jobs = []
    if args.mode == "comparison":
        for scale in args.scales:
            for dims in ("2d", "3d"):
                jobs.append((f"scale-{scale}-{dims}", dict(scale=scale), dims == "2d"))
    else:
        for inflow in args.inflows:
            for dims in ("2d", "3d"):
                jobs.append((f"inflow-{inflow}-{dims}", dict(inflow=inflow), dims == "2d"))

    for name, kwargs, two_d in jobs:
        config = ChannelConfig(holes=holes, **kwargs)
        if two_d:
            config = config.two_dimensionalized()
        case_dir = root / "cases" / name
        generate_case(case_dir, config)
        print(f"generated {name}")
        if args.mock_solve:
            mock_solve(case_dir, config, n_frames=args.frames)
            h5 = foam_case_to_h5(case_dir)
            add_grid_embedding(h5, case_dir)


if __name__ == "__main__":
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()  # re-exec once: warm-heap malloc on this VM
    main()
