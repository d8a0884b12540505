#!/usr/bin/env python
"""Submit OpenFOAM solver runs as a SLURM array job.

``python scripts/solve-slurm.py <cases_root> [--partition p] [--time 48:00:00]
   [--image openfoam-10] [--runner udocker|docker|native] [--dry-run]``

Each array task runs one case's ``entrypoint.sh`` inside the container; the
CPU count per task is read from the case's decomposeParDict — the protocol of
the reference's ``scripts/solve-slurm.py:15-98``.
"""

import argparse
import subprocess
import sys
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def cpu_count_for(case_dir: Path) -> int:
    from generative_turbulence_tpu.toolchain.foam_dicts import parse_foam_file

    f = case_dir / "system" / "decomposeParDict"
    if f.is_file():
        return int(parse_foam_file(f).get("numberOfSubdomains", 1))
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cases_root")
    ap.add_argument("--partition", default=None)
    ap.add_argument("--time", default="48:00:00")
    ap.add_argument("--mem-per-cpu", default="2G")
    ap.add_argument("--image", default="openfoam/openfoam10-paraview510")
    ap.add_argument("--runner", default="udocker", choices=["udocker", "docker", "native"])
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    cases = sorted(
        d for d in Path(args.cases_root).iterdir() if (d / "entrypoint.sh").is_file()
    )
    if not cases:
        print("no cases found", file=sys.stderr)
        return 1
    n_cpus = max(cpu_count_for(c) for c in cases)

    case_list = "\n".join(str(c.resolve()) for c in cases)
    list_file = Path(args.cases_root) / "slurm-cases.txt"
    list_file.write_text(case_list + "\n")

    if args.runner == "udocker":
        run_cmd = (
            f'udocker run -v "$CASE:/case" {args.image} /case/entrypoint.sh'
        )
    elif args.runner == "docker":
        run_cmd = f'docker run --rm -v "$CASE:/case" {args.image} /case/entrypoint.sh'
    else:
        run_cmd = '"$CASE/entrypoint.sh"'

    script = f"""#!/bin/bash
#SBATCH --array=1-{len(cases)}
#SBATCH --cpus-per-task={n_cpus}
#SBATCH --mem-per-cpu={args.mem_per_cpu}
#SBATCH --time={args.time}
{f'#SBATCH --partition={args.partition}' if args.partition else ''}
#SBATCH --output=%x-%a.out

CASE=$(sed -n "${{SLURM_ARRAY_TASK_ID}}p" {list_file.resolve()})
echo "solving $CASE with {n_cpus} cpus"
{run_cmd}
"""
    batch_file = Path(args.cases_root) / "solve.sbatch"
    batch_file.write_text(script)
    print(f"wrote {batch_file} ({len(cases)} cases, {n_cpus} cpus each)")

    if not args.dry_run:
        subprocess.run(["sbatch", str(batch_file)], check=True)


if __name__ == "__main__":
    main()
