"""Diagnostic plots: mid-plane slices and TKE spectra.

Counterpart of the reference's ``turbdiff/plots.py``: per-variable y/z
mid-plane slice comparisons (sample vs ground truth, incl. derived variables
curl/enstrophy/divergence computed through the grid embedding) and per-case
log-log TKE spectrum overlays from the spectra cached by ``WassersteinTKE``.
Rendering runs in a background process pool on validation end
(``PlotCallback``), writing PNGs into the run directory (+ wandb images when
available).
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.dataset import CaseData
from ..data.grid import GridMap, embed_cells
from ..data.variables import Variable
from ..ops.stencils import curl, divergence, enstrophy

DERIVED = {Variable.CURL, Variable.ENSTROPHY, Variable.DIVERGENCE}


def _dense_field(data: CaseData, v: Variable) -> np.ndarray:
    """Dense (B, X, Y, Z, C) field for a primary or derived variable."""
    import jax.numpy as jnp

    if v in DERIVED:
        grid = GridMap.from_metadata(data.metadata, (Variable.U,))
        u = embed_cells(jnp.asarray(data.fields[Variable.U]), grid)
        h = data.metadata.h
        if v is Variable.CURL:
            out = curl(u, h)
        elif v is Variable.ENSTROPHY:
            out = enstrophy(u, h)
        else:
            out = divergence(u, h)
        return np.asarray(out)
    grid = GridMap.from_metadata(data.metadata, (v,))
    return np.asarray(embed_cells(jnp.asarray(data.fields[v]), grid))


def _use_style():
    import matplotlib

    matplotlib.use("Agg")
    style = Path(__file__).parent / "turbulence.mplstyle"
    if style.is_file():
        import matplotlib.pyplot as plt

        plt.style.use(str(style))


def plot_slice(
    sample: CaseData,
    data: CaseData,
    variables: Sequence[Variable],
    out_file: Path,
    *,
    axis: str = "z",
):
    """Mid-plane slice grid: rows = variables (channel norms), cols = (sample,
    data).  Derived variables are trimmed near the outlet where the padding
    cells distort the stencil."""
    _use_style()
    import matplotlib.pyplot as plt

    n_vars = len(variables)
    fig, axes = plt.subplots(
        n_vars, 2, figsize=(10, 2.2 * n_vars), squeeze=False, constrained_layout=True
    )
    for row, v in enumerate(variables):
        fields = []
        for d in (sample, data):
            f = _dense_field(d, v)[0]  # first sample
            if f.shape[-1] > 1:
                f = np.linalg.norm(f, axis=-1)
            else:
                f = f[..., 0]
            if v in DERIVED:
                f = f[:-1]  # cut the stencil-distorted outlet column
            mid = f.shape[2] // 2 if axis == "z" else f.shape[1] // 2
            sl = f[:, :, mid] if axis == "z" else f[:, mid, :]
            fields.append(sl.T)
        # Color scales anchor on the DATA panel (reference plots.py:93-97):
        # signed fields (p, divergence) get a zero-centered diverging map,
        # everything else a sequential map on the data's range.
        import matplotlib.colors as mc

        data_sl = fields[-1]
        if v in (Variable.P, Variable.DIVERGENCE):
            norm = mc.CenteredNorm(vcenter=0, halfrange=np.abs(data_sl).max())
            cmap = "coolwarm"
        else:
            norm = mc.Normalize(vmin=data_sl.min(), vmax=data_sl.max())
            cmap = "cividis"
        for col, (name, sl) in enumerate(zip(("sample", "data"), fields)):
            ax = axes[row][col]
            im = ax.imshow(
                sl, origin="lower", norm=norm, cmap=cmap,
                interpolation="none", aspect="auto",
            )
            ax.set_title(f"{v.key} ({name})", fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
        fig.colorbar(im, ax=axes[row], shrink=0.8)
    out_file.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file, dpi=110)
    plt.close(fig)
    return out_file


def plot_tke_spectrum(
    log_tke_sample: np.ndarray,
    log_tke_data: np.ndarray,
    k: np.ndarray,
    out_file: Path,
    *,
    title: str = "",
):
    """Log-log E(k) overlay: individual sample spectra vs data spectra."""
    _use_style()
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5, 4), constrained_layout=True)
    for i, spec in enumerate(np.exp(log_tke_data)):
        ax.loglog(k, spec, color="C0", alpha=0.4, label="data" if i == 0 else None)
    for i, spec in enumerate(np.exp(log_tke_sample)):
        ax.loglog(k, spec, color="C1", alpha=0.6, label="sample" if i == 0 else None)
    ax.set_xlabel("k")
    ax.set_ylabel("E(k)")
    ax.set_title(title, fontsize=10)
    ax.legend()
    out_file.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_file, dpi=110)
    plt.close(fig)
    return out_file


def _render_spectrum_job(args):
    log_a, log_b, k, out_file, title = args
    return plot_tke_spectrum(log_a, log_b, k, Path(out_file), title=title)


def render_eval_plots(out_dir, store, collection, variables, phase: str, step: int):
    """Render all diagnostics for one eval epoch: spectrum overlays from the
    WassersteinTKE cache + y/z slice comparisons of the first case."""
    from ..data.schema import CaseRepository
    from .metrics import WassersteinTKE

    cb = PlotCallback(Path(out_dir))
    paths = []
    tke = next((m for m in collection.metrics if isinstance(m, WassersteinTKE)), None)
    if tke is not None:
        paths += cb.render_spectra(tke, phase, step)

    case_names = store.case_names
    if case_names:
        case = case_names[0]
        repo = CaseRepository(
            [collection.data_dir / case / "data.h5"], store.variables
        )
        meta = repo.read_metadata(0)
        samples = store.load_samples(meta)
        if samples.n_samples > 0:
            n_data = len(repo.times[0])
            data = repo.read(0, [n_data - 1])
            paths += cb.render_slices(samples, data, variables, phase, step)
    return paths


class PlotCallback:
    """Render validation plots asynchronously after each eval epoch."""

    def __init__(self, out_dir: Path, max_workers: int = 2):
        self.out_dir = Path(out_dir) / "plots"
        self.max_workers = max_workers

    def render_spectra(self, tke_metric, phase: str, step: int) -> List[Path]:
        """Render the spectra cached by a WassersteinTKE instance."""
        jobs = []
        for region, cases in tke_metric.case_data.items():
            for case, (log_a, log_b, k) in cases.items():
                out = self.out_dir / f"{phase}-{step}" / f"tke-{region}-{case}.png"
                jobs.append((log_a, log_b, k, str(out), f"{case} [{region}]"))
        if not jobs:
            return []
        if self.max_workers > 1 and len(jobs) > 2:
            with ProcessPoolExecutor(max_workers=self.max_workers) as pool:
                return list(pool.map(_render_spectrum_job, jobs))
        return [_render_spectrum_job(j) for j in jobs]

    def render_slices(
        self,
        sample: CaseData,
        data: CaseData,
        variables: Sequence[Variable],
        phase: str,
        step: int,
    ) -> List[Path]:
        outs = []
        for axis in ("y", "z"):
            out = (
                self.out_dir
                / f"{phase}-{step}"
                / f"{data.metadata.case_name}-{axis}-slice.png"
            )
            outs.append(plot_slice(sample, data, variables, out, axis=axis))
        return outs
