#!/usr/bin/env python
"""Diagnose non-monotone val/tke against the eps-loss trajectories.

The r4 overfit run showed val/tke bottoming mid-run and degrading while
train/loss kept falling.  Two rival explanations, separable with what the
trainer already logs every validation (``training/diffusion_task.py``
``eval_diagnostics``):

- OVERFITTING: the eps-net memorizes train frames — ``val/eps-loss-t*``
  RISES (or flattens then rises) while ``train/loss`` falls.  The gap
  between the two eps-losses is the signal.
- SAMPLER/SELECTION: the eps-net keeps improving on val (``val/eps-loss-t*``
  falls alongside ``train/loss``) but the sampled statistics still degrade —
  points at sampler config, EMA horizon, or the metric's sensitivity to
  amplitude drift (check ``val/sample-u-std`` alongside).

Writes one JSON (the aligned trajectories + verdict heuristics) and one PNG
(loss panel, eps-loss-per-t panel, val/tke + sample-u-std panel).

    python scripts/cpu-run.py scripts/diagnose-trajectory.py \
        runs/shapes-diffusion-r5 --out docs/runs/shapes-diffusion-r5/trajectory
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None, help="output prefix (json+png)")
    args = ap.parse_args()

    run_dir = Path(args.run_dir)
    records = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
        if line.strip()
    ]
    train = [(r["step"], r["train/loss"]) for r in records if "train/loss" in r]
    vals = [r for r in records if "val/tke" in r]
    eps_keys = sorted(
        {k for r in vals for k in r if k.startswith("val/eps-loss-t")},
        key=lambda k: int(k.rsplit("t", 1)[1]),
    )
    ema_keys = sorted(
        {k for r in vals for k in r if k.startswith("val/eps-loss-ema-t")},
        key=lambda k: int(k.rsplit("t", 1)[1]),
    )

    out = {
        "train": [{"step": s, "loss": l} for s, l in train],
        "validations": [
            {
                "step": r["step"],
                "val/tke": r.get("val/tke"),
                "val/max-mean-tke-pos": r.get("val/max-mean-tke-pos"),
                "val/sample-u-std": r.get("val/sample-u-std"),
                "val/sample-u-absmax": r.get("val/sample-u-absmax"),
                **{k: r.get(k) for k in eps_keys + ema_keys},
            }
            for r in vals
        ],
    }

    # Verdict heuristics: slope of val eps-loss (mean over t) across the
    # second half of validations vs the train-loss slope over the same steps.
    if len(vals) >= 3:
        steps = np.array([r["step"] for r in vals], dtype=float)
        eps_mean = np.array(
            [np.mean([r[k] for k in eps_keys if k in r]) for r in vals]
        )
        half = len(vals) // 2
        eps_slope = np.polyfit(steps[half:], eps_mean[half:], 1)[0]
        tsteps = np.array([s for s, _ in train], dtype=float)
        tloss = np.array([l for _, l in train])
        sel = tsteps >= steps[half]
        train_slope = np.polyfit(tsteps[sel], tloss[sel], 1)[0] if sel.sum() > 2 else float("nan")
        tke = np.array([r["val/tke"] for r in vals], dtype=float)
        out["verdict"] = {
            "val_eps_loss_slope_2nd_half": float(eps_slope),
            "train_loss_slope_2nd_half": float(train_slope),
            "val_tke_best_step": int(steps[int(np.nanargmin(tke))]),
            "val_tke_last_over_best": float(tke[-1] / np.nanmin(tke)),
            "overfitting_signature": bool(eps_slope > 0 and train_slope < 0),
        }
        print(json.dumps(out["verdict"], indent=2))

    if args.out:
        prefix = Path(args.out)
        prefix.parent.mkdir(parents=True, exist_ok=True)
        prefix.with_suffix(".json").write_text(json.dumps(out, indent=2))

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        s, l = zip(*train)
        axes[0].plot(s, l, lw=0.7)
        axes[0].set_yscale("log")
        axes[0].set_title("train/loss")
        axes[0].set_xlabel("step")
        vsteps = [r["step"] for r in vals]
        for k in eps_keys:
            axes[1].plot(vsteps, [r.get(k) for r in vals], marker="o", ms=3, label=k[len("val/eps-loss-"):])
        axes[1].set_yscale("log")
        axes[1].set_title("val/eps-loss per timestep")
        axes[1].set_xlabel("step")
        axes[1].legend(fontsize=7)
        ax2 = axes[2]
        ax2.plot(vsteps, [r.get("val/tke") for r in vals], marker="o", color="#d62728", label="val/tke")
        ax2.set_xlabel("step")
        ax2.set_ylabel("val/tke")
        ax2b = ax2.twinx()
        ax2b.plot(vsteps, [r.get("val/sample-u-std") for r in vals], marker="s", ms=3, color="#1f77b4", label="sample-u-std")
        ax2b.set_ylabel("val/sample-u-std")
        ax2.set_title("sampled statistics")
        fig.tight_layout()
        fig.savefig(prefix.with_suffix(".png"), dpi=110)
        print(f"wrote {prefix}.json / .png")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()
    main()
