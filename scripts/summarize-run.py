#!/usr/bin/env python
"""Distill a training run directory into committable artifacts.

Reads ``<run_dir>/metrics.jsonl`` (the MetricLogger stream) and writes
``<out_dir>/{metrics.jsonl,summary.json}``: the full metric stream plus a
summary with the config, the val-metric trajectory, the best step on the
monitor, and the final per-case metric table (the evidence the reference's
experiment protocol keeps in wandb, ``turbdiff/utils/callbacks.py:26-119``).

    python scripts/summarize-run.py runs/shapes-diffusion-r3 \
        docs/runs/shapes-diffusion-r3 [--monitor val/tke]
"""

import argparse
import json
import shutil
from pathlib import Path

from _common import REPO_ROOT  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--monitor", default="val/tke")
    args = ap.parse_args()

    run_dir = Path(args.run_dir)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    records = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if line.strip()
    ]
    val_records = [r for r in records if args.monitor in r]
    trajectory = [
        {
            "step": r["step"],
            "epoch": r.get("epoch"),
            "time_s": round(r["time"], 1),
            args.monitor: r[args.monitor],
        }
        for r in val_records
    ]
    best = min(val_records, key=lambda r: r[args.monitor]) if val_records else None

    # Final per-case table: any metric key of the form <phase>/<name>/<case>.
    per_case = {}
    if val_records:
        last = val_records[-1]
        for k, v in last.items():
            if isinstance(k, str) and k.count("/") == 2:
                per_case[k] = v

    train = [r for r in records if "train/loss" in r]
    summary = {
        "run_dir": str(run_dir),
        "monitor": args.monitor,
        "n_train_steps": train[-1]["step"] if train else None,
        "wall_time_s": round(records[-1]["time"], 1) if records else None,
        "train_loss_first": train[0]["train/loss"] if train else None,
        "train_loss_last": train[-1]["train/loss"] if train else None,
        "trajectory": trajectory,
        "best": best,
        "final_per_case": per_case,
    }
    cfg_file = run_dir / "checkpoints" / "config.json"
    if cfg_file.is_file():
        summary["config"] = json.loads(cfg_file.read_text())

    shutil.copy(run_dir / "metrics.jsonl", out_dir / "metrics.jsonl")
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(f"wrote {out_dir}/summary.json "
          f"({len(trajectory)} validations, best={best and best[args.monitor]})")


if __name__ == "__main__":
    main()
