#!/usr/bin/env python
"""Validate a generated dataset tree: per-case HDF5 integrity + artifacts.

``python scripts/validate-dataset.py <data_root> [--deep]``

Checks every ``cases/*/data.h5``: openable, finite fields, consistent
frame/cell counts, grid-embedding metadata present, and the analysis
artifacts (mean-flow.h5, regions.npz, max-mean-tke.npy) readable and finite.
``--deep`` additionally re-reads every frame (catches truncated chunks).
Exit code 1 if any case fails.  Counterpart of the reference's
generation-time asserts (``scripts/generate-shapes.py:155-178``) as a
standalone post-hoc check.
"""

import argparse
import json
import sys
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def check_case(case_dir: Path, deep: bool) -> list:
    import h5py
    import numpy as np

    errors = []
    h5 = case_dir / "data.h5"
    if not h5.is_file():
        return [f"missing {h5}"]
    try:
        with h5py.File(h5, "r") as f:
            for key in ("data", "grid", "geometry", "boundary-conditions"):
                if key not in f:
                    errors.append(f"missing group {key}")
            if errors:
                return errors
            u = f["data/u"]
            p = f["data/p"]
            t = f["data/times"][:] if "times" in f["data"] else None
            n_frames, n_cells = u.shape[0], u.shape[1]
            if p.shape[0] != n_frames or p.shape[1] != n_cells:
                errors.append(f"u/p shape mismatch: {u.shape} vs {p.shape}")
            if n_frames < 2:
                errors.append(f"too few frames: {n_frames}")
            frames = range(n_frames) if deep else [0, n_frames - 1]
            for i in frames:
                if not np.isfinite(u[i]).all():
                    errors.append(f"non-finite u in frame {i}")
                if not np.isfinite(p[i]).all():
                    errors.append(f"non-finite p in frame {i}")
            if t is not None and not np.all(np.diff(t) > 0):
                errors.append("non-monotonic times")
    except Exception as e:  # truncated/locked/corrupt file
        return [f"unreadable data.h5: {e!r}"]

    for name in ("mean-flow.h5", "regions.npz", "max-mean-tke.npy"):
        path = case_dir / name
        if not path.is_file():
            errors.append(f"missing {name}")
            continue
        try:
            if name.endswith(".h5"):
                with h5py.File(path, "r") as f:
                    def visit(key, obj):
                        if isinstance(obj, h5py.Dataset) and np.issubdtype(
                            obj.dtype, np.floating
                        ):
                            if not np.isfinite(obj[:]).all():
                                errors.append(f"non-finite {name}:{key}")

                    f.visititems(visit)
            elif name.endswith(".npz"):
                data = np.load(path)
                if "assignments" not in data:
                    errors.append(f"{name} missing assignments")
            else:
                arr = np.load(path)
                if not np.isfinite(arr).all():
                    errors.append(f"non-finite {name}")
        except Exception as e:
            errors.append(f"unreadable {name}: {e!r}")
    return errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("--deep", action="store_true", help="read every frame")
    args = ap.parse_args()

    root = Path(args.data_root)
    cases = sorted((root / "cases").iterdir()) if (root / "cases").is_dir() else []
    if not cases:
        print(f"no cases under {root}/cases", file=sys.stderr)
        return 1

    failed = {}
    for case_dir in cases:
        if not case_dir.is_dir():
            continue
        errors = check_case(case_dir, args.deep)
        status = "ok" if not errors else "FAIL"
        print(f"{case_dir.name}: {status}", file=sys.stderr)
        if errors:
            failed[case_dir.name] = errors

    print(json.dumps({"n_cases": len(cases), "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
