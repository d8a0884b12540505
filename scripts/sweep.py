#!/usr/bin/env python
"""Hyperparameter sweeps: the cartesian product of comma-separated override
values, run sequentially or emitted as a SLURM array.

``python scripts/sweep.py --sweep model=diffusion,tfnet,dilresnet
   --sweep trainer.seed=0,1,2 -- data.root=data/shapes``

Counterpart of the reference's hydra-multirun + submitit experiment presets
(``config/shapes_experiment.yaml``: model x 3 seeds, monitor val/tke).
"""

import argparse
import itertools
import subprocess
import sys
from pathlib import Path

from _common import REPO_ROOT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sweep", action="append", default=[],
        help="key=v1,v2,... (repeatable; cartesian product)",
    )
    ap.add_argument(
        "--derive", action="append", default=[],
        help=(
            "key=expr computed per run; {other.key} placeholders substitute "
            "swept values, then the expression is evaluated with math builtins "
            "(the reference's `eval:` resolver), e.g. "
            "--derive 'model.eval_unroll_steps=max(int(100/{data.stride}),1)'"
        ),
    )
    ap.add_argument("--slurm", action="store_true", help="emit an sbatch array instead")
    ap.add_argument("--time", default="96:00:00")
    ap.add_argument("--partition", default=None)
    ap.add_argument("--out", default="runs/sweep")
    ap.add_argument("rest", nargs="*", help="fixed overrides for every run")
    args = ap.parse_args()

    axes = []
    for spec in args.sweep:
        key, _, values = spec.partition("=")
        axes.append([(key, v) for v in values.split(",")])

    combos = list(itertools.product(*axes)) if axes else [()]
    runs = []
    for i, combo in enumerate(combos):
        overrides = [f"{k}={v}" for k, v in combo]
        values = dict(combo)
        for spec in args.derive:
            key, _, expr = spec.partition("=")
            for name, v in values.items():
                expr = expr.replace("{" + name + "}", str(v))
            import math

            result = eval(expr, {"__builtins__": {}, "math": math,
                                 "max": max, "min": min, "int": int, "float": float})
            overrides.append(f"{key}={result}")
        tag = "-".join(v.replace("/", "_") for _, v in combo) or f"run{i}"
        out_dir = Path(args.out) / tag
        runs.append(overrides + list(args.rest) + [f"trainer.out_dir={out_dir}"])

    if args.slurm:
        lines_file = Path(args.out)
        lines_file.mkdir(parents=True, exist_ok=True)
        cmds = [
            " ".join([sys.executable, str(REPO_ROOT / "scripts/train.py"), *r])
            for r in runs
        ]
        (lines_file / "sweep-cmds.txt").write_text("\n".join(cmds) + "\n")
        script = f"""#!/bin/bash
#SBATCH --array=1-{len(runs)}
#SBATCH --time={args.time}
{f'#SBATCH --partition={args.partition}' if args.partition else ''}
#SBATCH --output=%x-%a.out
eval "$(sed -n "${{SLURM_ARRAY_TASK_ID}}p" {lines_file.resolve()}/sweep-cmds.txt)"
"""
        (lines_file / "sweep.sbatch").write_text(script)
        print(f"wrote {lines_file}/sweep.sbatch ({len(runs)} runs)")
        try:
            subprocess.run(["sbatch", str(lines_file / "sweep.sbatch")], check=True)
        except FileNotFoundError:
            print("sbatch not available here; submit the file on the cluster")
        return

    for i, overrides in enumerate(runs):
        print(f"=== run {i + 1}/{len(runs)}: {' '.join(overrides)}", file=sys.stderr)
        subprocess.run(
            [sys.executable, str(REPO_ROOT / "scripts/train.py"), *overrides],
            check=True,
        )


if __name__ == "__main__":
    main()
