#!/usr/bin/env python
"""Streamwise mean-TKE profile of model samples vs ground truth.

Diagnoses the ``val/max-mean-tke-pos`` metric (squared argmax-position error
of the x-profile, ``eval/metrics.py`` MaxMeanTKEPositionMetric; reference
``turbdiff/models/metrics.py:557-581``): plots WHERE the sampled fluctuation
energy lives along the channel versus where the data puts it.

    python scripts/cpu-run.py scripts/tke-profile.py <samples.h5> <data_root>/val \
        --out docs/runs/<run>/tke-profile

Writes one JSON (profiles per case) and one PNG (grid of per-case overlays).
"""

import argparse
import json
from pathlib import Path

import numpy as np


def x_profile(u_embedded: np.ndarray, x_cut: int = 0) -> np.ndarray:
    """(B, X, Y, Z, 3) -> (X,) mean-TKE profile (fluctuations vs sample mean)."""
    u_fluc = u_embedded - u_embedded.mean(axis=0)
    tke = 0.5 * (u_fluc**2).sum(axis=-1)  # (B, X, Y, Z)
    return np.asarray(tke.mean(axis=(0, 2, 3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("samples_file")
    ap.add_argument("data_dir", help="split dir containing <case>/data.h5")
    ap.add_argument("--out", default="tke-profile", help="output prefix")
    ap.add_argument("--n-data", type=int, default=16,
                    help="GT frames (evenly spaced over the 2nd half)")
    args = ap.parse_args()

    from generative_turbulence_tpu.data.schema import CaseRepository
    from generative_turbulence_tpu.data.variables import Variable
    from generative_turbulence_tpu.eval.metrics import _embed_u
    from generative_turbulence_tpu.eval.sample_store import SampleStore

    store = SampleStore(Path(args.samples_file), (Variable.U, Variable.P))
    out = {}
    for case_name in store.case_names:
        repo = CaseRepository(
            [Path(args.data_dir) / case_name / "data.h5"], (Variable.U, Variable.P)
        )
        meta = repo.read_metadata(0)
        samples = store.load_samples(meta)
        n_data = len(repo.times[0])
        idx = np.round(
            np.linspace(n_data // 2, n_data - 1, num=args.n_data)
        ).astype(int)
        data = repo.read(0, idx)

        prof_s = x_profile(np.asarray(_embed_u(samples)))
        prof_d = x_profile(np.asarray(_embed_u(data)))
        gt_file = meta.file.parent / "max-mean-tke.npy"
        out[case_name] = {
            "samples": prof_s.tolist(),
            "data": prof_d.tolist(),
            "argmax_samples": int(prof_s[24:].argmax() + 24),
            "argmax_data": int(prof_d[24:].argmax() + 24),
            "gt_pos": float(np.load(gt_file)) if gt_file.is_file() else None,
        }
        print(
            f"{case_name}: data argmax {out[case_name]['argmax_data']} "
            f"(gt {out[case_name]['gt_pos']}), samples argmax "
            f"{out[case_name]['argmax_samples']}"
        )

    prefix = Path(args.out)
    prefix.parent.mkdir(parents=True, exist_ok=True)
    prefix.with_suffix(".json").write_text(json.dumps(out, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(out)
    cols = min(3, n)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.2 * rows), squeeze=False)
    for ax, (case, d) in zip(axes.flat, sorted(out.items())):
        ax.plot(d["data"], label="data", color="#333333")
        ax.plot(d["samples"], label="samples", color="#d62728")
        if d["gt_pos"] is not None:
            ax.axvline(d["gt_pos"], ls="--", lw=0.8, color="#333333")
        ax.axvline(d["argmax_samples"], ls="--", lw=0.8, color="#d62728")
        ax.set_title(case, fontsize=9)
        ax.set_xlabel("x cell")
        ax.set_ylabel("mean TKE")
    for ax in axes.flat[n:]:
        ax.axis("off")
    axes.flat[0].legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(prefix.with_suffix(".png"), dpi=110)
    print(f"wrote {prefix}.json / .png")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from _common import ensure_malloc_reuse

    ensure_malloc_reuse()
    main()
