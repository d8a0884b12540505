"""Synthetic case generator: fabricates schema-complete datasets for tests and
benchmarks so that nothing requires the ~2 TB OpenFOAM dataset.

Produces per case: ``data.h5`` (full schema, see ``schema.py``),
``mean-flow.h5``, ``regions.npz``, ``max-mean-tke.npy``; plus a dataset-level
``stats.pickle`` computed over the train split — the same aux-file protocol the
reference's evaluation expects (``turbdiff/models/metrics.py:399,495,562``).

The flow fields are smooth random Fourier fields around a plug inflow profile;
they are not physical, but they exercise every code path (grid embedding,
boundary conditions, normalization, spectra, metrics).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Sequence, Tuple

import h5py
import numpy as np

from ..utils.index import ravel_multi_index
from .schema import BCType, BoundaryCondition, FieldStats, write_case_h5
from .variables import Variable


def _boundary_indices(
    inside: np.ndarray, padded: Tuple[int, int, int]
) -> Dict[str, np.ndarray]:
    """Classify padding/hole cells adjacent to the domain into boundaries.

    inside: (X, Y, Z) bool on the padded grid.
    Returns {name: flat idx array} with names inlets/outlets/walls (and
    empties for 2D cases, i.e. an axis with a single unpadded cell).
    """
    X, Y, Z = padded
    # A non-domain cell adjacent (6-neighborhood) to a domain cell.
    adjacent = np.zeros_like(inside)
    for axis in range(3):
        for shift in (-1, 1):
            adjacent |= np.roll(inside, shift, axis=axis)
    boundary = adjacent & ~inside

    coords = np.argwhere(boundary)
    names = np.full(len(coords), "walls", dtype=object)
    names[coords[:, 0] == 0] = "inlets"
    names[coords[:, 0] == X - 1] = "outlets"

    two_d_axes = [a for a, n in enumerate(padded) if n == 3]
    for a in two_d_axes:
        on_flat_face = (coords[:, a] == 0) | (coords[:, a] == padded[a] - 1)
        names[on_flat_face] = "empties"

    out: Dict[str, np.ndarray] = {}
    for name in ("inlets", "outlets", "walls", "empties"):
        sel = names == name
        if sel.any():
            out[name] = ravel_multi_index(coords[sel], padded).astype(np.int64)
    return out


def _smooth_field(
    rng: np.random.Generator,
    n_frames: int,
    shape: Tuple[int, int, int],
    n_channels: int,
    n_modes: int = 6,
) -> np.ndarray:
    """Random band-limited space-time field, (T, X, Y, Z, C)."""
    X, Y, Z = shape
    x = np.linspace(0, 2 * np.pi, X, endpoint=False)
    y = np.linspace(0, 2 * np.pi, Y, endpoint=False)
    z = np.linspace(0, 2 * np.pi, Z, endpoint=False)
    t = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    field = np.zeros((n_frames, X, Y, Z, n_channels), dtype=np.float64)
    for c in range(n_channels):
        for _ in range(n_modes):
            kx, ky, kz, kt = rng.integers(1, 4, size=4)
            phase = rng.uniform(0, 2 * np.pi, size=4)
            amp = rng.uniform(0.2, 1.0) / n_modes
            field[..., c] += amp * (
                np.sin(kt * t + phase[3])[:, None, None, None]
                * np.sin(kx * x + phase[0])[None, :, None, None]
                * np.sin(ky * y + phase[1])[None, None, :, None]
                * np.sin(kz * z + phase[2])[None, None, None, :]
            )
    return field.astype(np.float32)


def generate_case(
    case_dir: Path,
    *,
    cell_counts: Tuple[int, int, int] = (24, 10, 10),
    n_frames: int = 16,
    inflow: float = 20.0,
    nu: float = 1e-5,
    dt: float = 1e-4,
    hole: bool = True,
    seed: int = 0,
) -> Path:
    """Write one synthetic case into ``case_dir/data.h5`` (+ aux files)."""
    rng = np.random.default_rng(seed)
    case_dir = Path(case_dir)
    case_dir.mkdir(parents=True, exist_ok=True)

    nx, ny, nz = cell_counts
    padded = (nx + 2, ny + 2, nz + 2)

    inside = np.zeros(padded, dtype=bool)
    inside[1 : nx + 1, 1 : ny + 1, 1 : nz + 1] = True

    holes = []
    if hole and min(ny, nz) >= 6:
        # A box obstacle in the front third of the channel.
        hx = max(2, nx // 8)
        hy, hz = max(2, ny // 3), max(2, nz // 3)
        ox = max(2, nx // 4)
        oy, oz = (ny - hy) // 2 + 1, (nz - hz) // 2 + 1
        inside[ox : ox + hx, oy : oy + hy, oz : oz + hz] = False
        holes.append(
            (
                np.array([ox - 1, oy - 1, oz - 1], dtype=np.int64),
                np.array([hx, hy, hz], dtype=np.int64),
            )
        )

    cell_idx = np.flatnonzero(inside.reshape(-1)).astype(np.int64)
    b_idx = _boundary_indices(inside, padded)
    boundaries = {name: {"type": name, "idx": idx} for name, idx in b_idx.items()}

    boundary_conditions: Dict[Variable, Dict[str, BoundaryCondition]] = {
        Variable.U: {},
        Variable.P: {},
        Variable.K: {},
        Variable.NUT: {},
    }
    if "inlets" in boundaries:
        boundary_conditions[Variable.U]["inlets"] = BoundaryCondition(
            BCType.FIXED_VALUE, np.array([inflow, 0.0, 0.0], dtype=np.float32)
        )
        boundary_conditions[Variable.P]["inlets"] = BoundaryCondition(BCType.ZERO_GRADIENT)
        boundary_conditions[Variable.K]["inlets"] = BoundaryCondition(
            BCType.FIXED_VALUE, np.array([1e-3], dtype=np.float32)
        )
        boundary_conditions[Variable.NUT]["inlets"] = BoundaryCondition(BCType.ZERO_GRADIENT)
    if "walls" in boundaries:
        boundary_conditions[Variable.U]["walls"] = BoundaryCondition(
            BCType.FIXED_VALUE, np.zeros(3, dtype=np.float32)
        )
        boundary_conditions[Variable.P]["walls"] = BoundaryCondition(BCType.ZERO_GRADIENT)
        boundary_conditions[Variable.K]["walls"] = BoundaryCondition(
            BCType.FIXED_VALUE, np.array([0.0], dtype=np.float32)
        )
        boundary_conditions[Variable.NUT]["walls"] = BoundaryCondition(
            BCType.FIXED_VALUE, np.array([0.0], dtype=np.float32)
        )
    if "outlets" in boundaries:
        boundary_conditions[Variable.U]["outlets"] = BoundaryCondition(BCType.INLET_OUTLET)
        boundary_conditions[Variable.P]["outlets"] = BoundaryCondition(
            BCType.FIXED_VALUE, np.array([0.0], dtype=np.float32)
        )
        boundary_conditions[Variable.K]["outlets"] = BoundaryCondition(BCType.ZERO_GRADIENT)
        boundary_conditions[Variable.NUT]["outlets"] = BoundaryCondition(BCType.ZERO_GRADIENT)

    # Fields on the dense padded grid, then gathered at in-domain cells.
    u_grid = _smooth_field(rng, n_frames, padded, 3) * 0.3 * inflow
    u_grid[..., 0] += inflow  # plug flow in x
    p_grid = _smooth_field(rng, n_frames, padded, 1) * 0.5 * inflow
    k_grid = np.abs(_smooth_field(rng, n_frames, padded, 1)) * 0.05 * inflow
    nut_grid = np.abs(_smooth_field(rng, n_frames, padded, 1)) * nu * 10

    flat_idx = cell_idx

    def gather(grid: np.ndarray) -> np.ndarray:
        T, C = grid.shape[0], grid.shape[-1]
        return grid.reshape(T, -1, C)[:, flat_idx, :]

    fields = {
        Variable.U: gather(u_grid),
        Variable.P: gather(p_grid),
        Variable.K: gather(k_grid),
        Variable.NUT: gather(nut_grid),
    }

    times = (np.arange(n_frames) + 1) * dt

    # Physical bounding box sized so h is isotropic-ish.
    h = 0.4 / 192  # the shapes dataset's cell size
    bounding_box = np.array([nx * h, ny * h, nz * h])

    write_case_h5(
        case_dir / "data.h5",
        nu=nu,
        bounding_box=bounding_box,
        unpadded_cell_counts=np.array([nx, ny, nz]),
        cell_idx=cell_idx,
        boundaries=boundaries,
        boundary_conditions=boundary_conditions,
        holes=holes,
        times=times,
        fields=fields,
    )

    # Aux files used by the evaluation metrics -------------------------------
    with h5py.File(case_dir / "mean-flow.h5", "w") as f:
        g = f.create_group("data")
        g.create_dataset("u", data=fields[Variable.U].mean(axis=0))
        g.create_dataset("p", data=fields[Variable.P].mean(axis=0))

    # Homogeneous regions: contiguous chunks of the cell list (synthetic stand-in
    # for the k-means regions of scripts/homogeneous-regions.py).
    n_regions = 4
    assignments = (np.arange(len(cell_idx)) * n_regions // len(cell_idx)).astype(np.int64)
    np.savez(case_dir / "regions.npz", assignments=assignments)

    # Ground-truth argmax-x of the mean TKE profile behind the obstacle.
    u_mean = u_grid.mean(axis=0)
    u_fluc = u_grid - u_mean
    tke = 0.5 * (u_fluc**2).sum(axis=-1).mean(axis=0)  # (X, Y, Z)
    x_cut = min(24, tke.shape[0] - 1)
    profile = tke[x_cut:].mean(axis=(1, 2))
    np.save(case_dir / "max-mean-tke.npy", float(np.argmax(profile) + x_cut))

    return case_dir / "data.h5"


def _numpy_curl(u: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Curl of a dense (..., X, Y, Z, 3) field at interior cells, centered diffs.

    The spatial axes are the LAST three before the channel axis; leading axes
    (e.g. time) are preserved.
    """

    def d(f: np.ndarray, axis: int) -> np.ndarray:
        # f has shape (..., X, Y, Z); slice only the trailing spatial axes.
        lead = f.ndim - 3
        sl_p = [slice(None)] * lead + [slice(1, -1)] * 3
        sl_m = [slice(None)] * lead + [slice(1, -1)] * 3
        sl_p[lead + axis] = slice(2, None)
        sl_m[lead + axis] = slice(0, -2)
        return (f[tuple(sl_p)] - f[tuple(sl_m)]) / (2 * h[axis])

    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    wx = d(uz, 1) - d(uy, 2)
    wy = d(ux, 2) - d(uz, 0)
    wz = d(uy, 0) - d(ux, 1)
    return np.stack([wx, wy, wz], axis=-1)


def compute_stats(train_files: Sequence[Path]) -> FieldStats:
    """Streaming min/max/mean/std over train cases for p,u,k,nut + norm(u),
    norm(curl) — the ``stats.pickle`` protocol of ``scripts/dataset-stats.py``."""
    from .schema import read_metadata

    acc: Dict[str, Dict[str, np.ndarray]] = {}

    def update(key: str, values: np.ndarray):
        # values: (N, C)
        values = values.reshape(-1, values.shape[-1]).astype(np.float64)
        entry = acc.setdefault(
            key,
            {
                "min": np.full(values.shape[-1], np.inf),
                "max": np.full(values.shape[-1], -np.inf),
                "sum": np.zeros(values.shape[-1]),
                "sumsq": np.zeros(values.shape[-1]),
                "count": np.zeros(1),
            },
        )
        entry["min"] = np.minimum(entry["min"], values.min(axis=0))
        entry["max"] = np.maximum(entry["max"], values.max(axis=0))
        entry["sum"] += values.sum(axis=0)
        entry["sumsq"] += (values**2).sum(axis=0)
        entry["count"] += len(values)

    dense = None
    for file in train_files:
        meta = read_metadata(file)
        X, Y, Z = (int(c) for c in meta.cell_counts)
        # Stream frame-by-frame with a reused dense buffer: materializing all
        # T frames at once costs ~1.5 GB of fresh allocations per case, which
        # dominates wall-clock on small hosts (first-touch page faults).
        if dense is None or dense.shape[0] != X * Y * Z:
            dense = np.zeros((X * Y * Z, 3), dtype=np.float32)
        with h5py.File(file, "r") as f:
            T = f["data/u"].shape[0]
            for t in range(T):
                u = np.asarray(f["data/u"][t], dtype=np.float32)
                update("u", u)
                update("p", np.asarray(f["data/p"][t], dtype=np.float32)[..., None])
                update("k", np.asarray(f["data/k"][t], dtype=np.float32)[..., None])
                update(
                    "nut", np.asarray(f["data/nut"][t], dtype=np.float32)[..., None]
                )
                update("norm(u)", np.linalg.norm(u, axis=-1, keepdims=True))

                # Curl through the grid embedding, at unpadded interior cells.
                dense[:] = 0.0
                dense[meta.cell_idx] = u
                curl = _numpy_curl(dense.reshape(X, Y, Z, 3), meta.h)
                assert curl.shape == (X - 2, Y - 2, Z - 2, 3)
                curl_cells = curl.reshape(-1, 3)[meta.unpadded_cell_idx]
                update(
                    "norm(curl)",
                    np.linalg.norm(curl_cells, axis=-1, keepdims=True),
                )

    stats: Dict[str, Dict[str, np.ndarray]] = {}
    for key, entry in acc.items():
        n = entry["count"]
        mean = entry["sum"] / n
        var = np.maximum(entry["sumsq"] / n - mean**2, 0.0)
        stats[key] = {
            "min": entry["min"].astype(np.float32),
            "max": entry["max"].astype(np.float32),
            "mean": mean.astype(np.float32),
            "std": np.sqrt(var).astype(np.float32),
        }
        for name in ("min", "max", "mean", "std"):
            if stats[key][name].shape == (1,):
                stats[key][name] = stats[key][name][0]
    return FieldStats(stats)


def generate_synthetic_dataset(
    root: Path,
    *,
    n_train_cases: int = 2,
    n_val_cases: int = 1,
    n_test_cases: int = 1,
    n_frames: int = 16,
    cell_counts: Tuple[int, int, int] = (24, 10, 10),
    inflow: float = 20.0,
    seed: int = 0,
) -> Path:
    """Create ``root/{train,val,test}/case-*/data.h5`` + ``root/stats.pickle``."""
    root = Path(root)
    splits = {"train": n_train_cases, "val": n_val_cases, "test": n_test_cases}
    train_files = []
    case_seed = seed
    for split, n_cases in splits.items():
        for i in range(n_cases):
            case_dir = root / split / f"case-{split}-{i:02d}"
            file = generate_case(
                case_dir,
                cell_counts=cell_counts,
                n_frames=n_frames,
                inflow=inflow,
                seed=case_seed,
            )
            case_seed += 1
            if split == "train":
                train_files.append(file)

    stats = compute_stats(train_files)
    stats.to_file(root / "stats.pickle")
    return root
