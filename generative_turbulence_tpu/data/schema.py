"""The on-disk dataset schema (``data.h5`` + ``stats.pickle``) and its readers.

The HDF5 schema is byte-compatible with the reference pipeline so that
datasets produced by either toolchain are interchangeable
(see ``scripts/foam2h5.py:165-191`` and ``scripts/grid-embedding.py:75-90``
in the reference, and ``README.md:100-127`` for the canonical consumer):

- ``physical@nu``                              kinematic viscosity
- ``domain/{points,faces,face2cell,cells}``    raw mesh (not needed at train time)
- ``boundary-conditions/<var>/<boundary>``     @type + optional ``value`` dataset
- ``data/times``                               (T,) float
- ``data/{u,p,k,nut}``                         (T, n_cells[, dims]) float32
- ``geometry/{bounding_box,cell_counts}``      physical size / unpadded resolution
- ``geometry/holes/{positions,sizes}``         obstacles
- ``grid/cell_counts``                         PADDED grid shape (unpadded + 2)
- ``grid/cell_idx``                            flat indices of in-domain cells
- ``grid/boundaries/<name>``                   padding-cell index arrays, @type

Everything in this module is host-side numpy; device code receives plain
arrays extracted from these dataclasses.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from ..utils.index import ravel_multi_index, unravel_index
from .variables import Variable, total_dims


class BCType(enum.Enum):
    FIXED_VALUE = "fixed-value"
    ZERO_GRADIENT = "zero-gradient"
    INLET_OUTLET = "inlet-outlet"


@dataclasses.dataclass(frozen=True)
class BoundaryCondition:
    type: BCType
    value: Optional[np.ndarray] = None  # only for FIXED_VALUE

    @staticmethod
    def from_h5(group: h5py.Group) -> "BoundaryCondition":
        kind = group.attrs["type"]
        if isinstance(kind, bytes):
            kind = kind.decode()
        bc_type = BCType(kind)
        value = None
        if bc_type is BCType.FIXED_VALUE:
            value = np.atleast_1d(np.asarray(group["value"], dtype=np.float32))
        return BoundaryCondition(bc_type, value)

    def to_h5(self, group: h5py.Group):
        group.attrs["type"] = self.type.value
        if self.type is BCType.FIXED_VALUE:
            group.create_dataset("value", data=np.asarray(self.value, dtype=np.float32))


# Cell types on the padded grid.  Order matters: it defines embedding indices.
CELL_TYPES = ("inside", "outside", "walls", "inlets", "outlets", "empties")
CELL_TYPE_IDS = {name: i for i, name in enumerate(CELL_TYPES)}
N_CELL_TYPES = len(CELL_TYPES)


@dataclasses.dataclass
class CaseMetadata:
    """Static geometry of one simulation case.

    ``cell_counts`` is the PADDED dense grid shape; ``cell_idx`` holds the flat
    indices (row-major over the padded grid) of the real simulation cells.
    Boundary-condition padding cells carry Dirichlet values where applicable.
    Equivalent role to ``turbdiff/data/ofles.py:103-183``.
    """

    file: Path
    nu: float
    h: np.ndarray  # (3,) physical cell size
    cell_counts: np.ndarray  # (3,) padded
    cell_idx: np.ndarray  # (n_cells,) int32
    boundaries: Dict[str, Dict]  # name -> {"type": str, "idx": np.ndarray}
    boundary_conditions: Dict[Variable, Dict[str, BoundaryCondition]]
    holes: List[Tuple[np.ndarray, np.ndarray]]  # (position, size) pairs

    _cache: dict = dataclasses.field(default_factory=dict, repr=False)

    # ---- derived geometry -------------------------------------------------

    @property
    def case_name(self) -> str:
        return self.file.parent.name

    @property
    def n_cells(self) -> int:
        return int(len(self.cell_idx))

    @property
    def two_dimensional(self) -> bool:
        # Padding turns a single-cell axis into 3 cells.
        return int(np.min(self.cell_counts)) == 3

    @property
    def unpadded_cell_counts(self) -> np.ndarray:
        return self.cell_counts - 2

    @property
    def unpadded_cell_idx(self) -> np.ndarray:
        if "unpadded_cell_idx" not in self._cache:
            coords = unravel_index(self.cell_idx, tuple(self.cell_counts)) - 1
            self._cache["unpadded_cell_idx"] = ravel_multi_index(
                coords, tuple(self.unpadded_cell_counts)
            ).astype(np.int32)
        return self._cache["unpadded_cell_idx"]

    @property
    def inside_mask(self) -> np.ndarray:
        """(X, Y, Z) bool mask of in-domain cells on the padded grid."""
        if "inside_mask" not in self._cache:
            mask = np.zeros(int(np.prod(self.cell_counts)), dtype=bool)
            mask[self.cell_idx] = True
            self._cache["inside_mask"] = mask.reshape(tuple(self.cell_counts))
        return self._cache["inside_mask"]

    @property
    def cell_types(self) -> np.ndarray:
        """(X, Y, Z) int32 grid of CELL_TYPES ids (reference:
        ``turbdiff/models/cell_type_embeddings.py:47-58``)."""
        if "cell_types" not in self._cache:
            types = np.full(
                int(np.prod(self.cell_counts)), CELL_TYPE_IDS["outside"], dtype=np.int32
            )
            types[self.cell_idx] = CELL_TYPE_IDS["inside"]
            for name, desc in self.boundaries.items():
                types[desc["idx"]] = CELL_TYPE_IDS[name]
            self._cache["cell_types"] = types.reshape(tuple(self.cell_counts))
        return self._cache["cell_types"]

    @property
    def hydraulic_diameter(self) -> float:
        ny, nz = self.unpadded_cell_counts[1], self.unpadded_cell_counts[2]
        hy, hz = self.h[1], self.h[2]
        cross_section = (ny * hy) * (nz * hz)
        perimeter = 2 * (ny * hy + nz * hz)
        return float(4 * cross_section / perimeter)

    # ---- Dirichlet scatter table ------------------------------------------

    def dirichlet_table(
        self, variables: Sequence[Variable]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Combined (idx, values) arrays for all FIXED_VALUE boundary cells.

        ``idx`` has shape (M,) flat padded-grid indices and ``values`` has
        shape (M, F) where F = total stacked channel dim of ``variables``.
        Cells not covered by a Dirichlet BC for some variable keep value 0 in
        those channels but are only scattered where a BC exists; to keep the
        scatter single-shot, values default to 0 and the row is emitted once
        per boundary with the union of its per-variable values.  Rows are
        deduplicated by boundary so each boundary contributes one block.
        """
        key = ("dirichlet", tuple(v.key for v in variables))
        if key not in self._cache:
            F = total_dims(variables)
            idx_blocks: List[np.ndarray] = []
            val_blocks: List[np.ndarray] = []
            # Group by boundary so that one boundary's cells get all their
            # variables' fixed values in a single row block.
            for name, desc in self.boundaries.items():
                start = 0
                row_vals = None
                any_fixed = False
                for v in variables:
                    bc = self.boundary_conditions.get(v, {}).get(name)
                    if bc is not None and bc.type is BCType.FIXED_VALUE:
                        if row_vals is None:
                            row_vals = np.zeros((len(desc["idx"]), F), dtype=np.float32)
                        val = np.broadcast_to(bc.value, (v.dims,)).astype(np.float32)
                        row_vals[:, start : start + v.dims] = val
                        any_fixed = True
                    start += v.dims
                if any_fixed:
                    idx_blocks.append(np.asarray(desc["idx"], dtype=np.int32))
                    val_blocks.append(row_vals)
            if idx_blocks:
                idx = np.concatenate(idx_blocks)
                vals = np.concatenate(val_blocks)
            else:
                idx = np.zeros((0,), dtype=np.int32)
                vals = np.zeros((0, F), dtype=np.float32)
            self._cache[key] = (idx, vals)
        return self._cache[key]


@dataclasses.dataclass
class FieldStats:
    """Training-set statistics (``stats.pickle``): per-field min/max/mean/std,
    including derived ``norm(u)``/``norm(curl)`` entries.

    ``normalizers`` reproduces the mode-string semantics of
    ``turbdiff/data/ofles.py:249-294``: a plain mode applies to every variable;
    ``"u:norm-max;p:abs-max"`` assigns per-variable modes.  Modes:

    - ``norm``      std = mean of |v| (vector norm stats)
    - ``norm-std``  mean/std of |v|
    - ``norm-max``  std = max |v|
    - ``abs-max``   std = max(|min|, |max|) per channel
    - ``mean-std``  per-channel mean/std
    - ``std``       per-channel std only
    """

    stats: Dict[str, Dict[str, np.ndarray]]

    def normalizers(
        self, variables: Sequence[Variable], mode: str
    ) -> Tuple[np.ndarray, np.ndarray]:
        if ":" in mode:
            per_var = {}
            for pair in mode.split(";"):
                name, _, m = pair.partition(":")
                per_var[Variable.from_str(name)] = m
            mode_for = lambda v: per_var[v]  # noqa: E731
        else:
            mode_for = lambda v: mode  # noqa: E731

        F = total_dims(variables)
        mean = np.zeros(F, dtype=np.float32)
        std = np.ones(F, dtype=np.float32)
        start = 0
        for v in variables:
            sl = slice(start, start + v.dims)
            m = mode_for(v)
            if "norm" in m:
                s = self.stats[f"norm({v.key})"]
                if m == "norm":
                    std[sl] = s["mean"]
                elif m == "norm-std":
                    mean[sl] = s["mean"]
                    std[sl] = s["std"]
                elif m == "norm-max":
                    std[sl] = s["max"]
                else:
                    raise ValueError(f"Unknown normalization mode {m!r}")
            else:
                s = self.stats[v.key]
                if m == "abs-max":
                    std[sl] = np.maximum(np.abs(s["min"]), np.abs(s["max"]))
                elif m == "mean-std":
                    mean[sl] = s["mean"]
                    std[sl] = s["std"]
                elif m == "std":
                    std[sl] = s["std"]
                else:
                    raise ValueError(f"Unknown normalization mode {m!r}")
            start += v.dims

        std = np.where(std >= 1e-8, std, 1.0).astype(np.float32)
        return mean, std

    def envelope(
        self, variables: Sequence["Variable"]
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Channelwise training-set (min, max) envelope, physical units."""
        F = total_dims(variables)
        lo = np.empty(F, dtype=np.float32)
        hi = np.empty(F, dtype=np.float32)
        start = 0
        for v in variables:
            sl = slice(start, start + v.dims)
            s = self.stats[v.key]
            lo[sl] = np.broadcast_to(s["min"], (v.dims,))
            hi[sl] = np.broadcast_to(s["max"], (v.dims,))
            start += v.dims
        return lo, hi

    @staticmethod
    def from_file(file: Path) -> "FieldStats":
        raw = pickle.loads(Path(file).read_bytes())
        stats = {
            key: {name: np.asarray(value, dtype=np.float32) for name, value in d.items()}
            for key, d in raw.items()
        }
        return FieldStats(stats)

    def to_file(self, file: Path):
        raw = {
            key: {name: np.asarray(value) for name, value in d.items()}
            for key, d in self.stats.items()
        }
        Path(file).write_bytes(pickle.dumps(raw))


def read_metadata(file: Path) -> CaseMetadata:
    """Read the static geometry of a case from its ``data.h5``."""
    file = Path(file)
    with h5py.File(file, "r") as f:
        bounding_box = np.asarray(f["geometry/bounding_box"], dtype=np.float64)
        bb_cell_counts = np.asarray(f["geometry/cell_counts"], dtype=np.int64)
        h = (bounding_box / bb_cell_counts).astype(np.float32)

        nu = float(f["physical"].attrs["nu"])

        hole_pos = np.asarray(f["geometry/holes/positions"])
        hole_sizes = np.asarray(f["geometry/holes/sizes"])
        holes = [(hole_pos[i], hole_sizes[i]) for i in range(len(hole_pos))]

        cell_counts = np.asarray(f["grid/cell_counts"], dtype=np.int64)
        cell_idx = np.asarray(f["grid/cell_idx"], dtype=np.int32)

        boundaries = {}
        for name in f["grid/boundaries"].keys():
            grp = f["grid/boundaries"][name]
            kind = grp.attrs["type"]
            if isinstance(kind, bytes):
                kind = kind.decode()
            boundaries[name] = {
                "type": kind,
                "idx": np.asarray(grp, dtype=np.int32),
            }

        boundary_conditions = {}
        for var_name, bcs in f["boundary-conditions"].items():
            v = Variable.from_str(var_name)
            boundary_conditions[v] = {
                bname: BoundaryCondition.from_h5(grp) for bname, grp in bcs.items()
            }

    return CaseMetadata(
        file=file,
        nu=nu,
        h=h,
        cell_counts=cell_counts,
        cell_idx=cell_idx,
        boundaries=boundaries,
        boundary_conditions=boundary_conditions,
        holes=holes,
    )


class CaseRepository:
    """Reader over a list of ``data.h5`` files (one per case).

    Per-file metadata and time arrays are cached; frame reads handle h5py's
    sorted-unique fancy-indexing requirement.  Equivalent role to
    ``turbdiff/data/ofles.py:320-418``.
    """

    def __init__(self, files: Sequence[Path], variables: Sequence[Variable]):
        self.files = [Path(f) for f in files]
        self.variables = tuple(variables)
        self.reset_caches()

    def reset_caches(self):
        self._metadata: Dict[int, CaseMetadata] = {}
        self._times: Optional[List[np.ndarray]] = None

    @property
    def n_cases(self) -> int:
        return len(self.files)

    @property
    def times(self) -> List[np.ndarray]:
        if self._times is None:
            self._times = []
            for file in self.files:
                with h5py.File(file, "r") as f:
                    self._times.append(np.asarray(f["data/times"]).copy())
        return self._times

    def read_metadata(self, file_idx: int) -> CaseMetadata:
        if file_idx not in self._metadata:
            self._metadata[file_idx] = read_metadata(self.files[file_idx])
        return self._metadata[file_idx]

    def open(self, file_idx: int) -> h5py.File:
        """Open a case file for direct dataset access (caller closes)."""
        return h5py.File(self.files[file_idx], "r")

    def read_frames(self, file_idx: int, sample_idxs: Sequence[int]) -> Dict[Variable, np.ndarray]:
        """Read frames as {Variable: (B, n_cells, dims) float32}."""
        sample_idxs = np.asarray(sample_idxs)
        unique_sorted, inverse = np.unique(sample_idxs, return_inverse=True)
        with h5py.File(self.files[file_idx], "r") as f:
            group = f["data"]
            out = {}
            for v in self.variables:
                arr = np.asarray(group[v.key][unique_sorted.tolist()], dtype=np.float32)
                if arr.ndim == 2:
                    arr = arr[..., None]
                out[v] = arr[inverse]
        return out

    def read(self, file_idx: int, sample_idxs: Sequence[int]):
        from .dataset import CaseData  # local import to avoid a cycle

        metadata = self.read_metadata(file_idx)
        t = self.times[file_idx][np.asarray(sample_idxs)]
        fields = self.read_frames(file_idx, sample_idxs)
        return CaseData(metadata=metadata, t=t, fields=fields)


def find_data_files(cases_root: Path) -> List[Path]:
    cases_root = Path(cases_root)
    files = [
        path
        for child in sorted(cases_root.iterdir())
        if (path := child / "data.h5").is_file()
    ]
    return files


def write_case_h5(
    file: Path,
    *,
    nu: float,
    bounding_box: np.ndarray,
    unpadded_cell_counts: np.ndarray,
    cell_idx: np.ndarray,
    boundaries: Dict[str, Dict],
    boundary_conditions: Dict[Variable, Dict[str, BoundaryCondition]],
    holes: Sequence[Tuple[np.ndarray, np.ndarray]],
    times: np.ndarray,
    fields: Dict[Variable, np.ndarray],
    domain: Optional[Dict[str, np.ndarray]] = None,
):
    """Write a complete ``data.h5`` following the schema above."""
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    padded = np.asarray(unpadded_cell_counts) + 2
    with h5py.File(file, "w") as f:
        f.create_group("physical").attrs["nu"] = nu

        dom = f.create_group("domain")
        if domain:
            for name, arr in domain.items():
                dom.create_dataset(name, data=arr)
        dom.attrs["boundaries"] = json.dumps(
            {name: desc["type"] for name, desc in boundaries.items()}
        )

        bc_group = f.create_group("boundary-conditions")
        for v, bcs in boundary_conditions.items():
            var_group = bc_group.create_group(v.key)
            for bname, bc in bcs.items():
                bc.to_h5(var_group.create_group(bname))

        data = f.create_group("data")
        data.create_dataset("times", data=np.asarray(times, dtype=np.float64))
        for v, arr in fields.items():
            arr = np.asarray(arr, dtype=np.float32)
            if arr.ndim == 3 and arr.shape[-1] == 1:
                arr = arr[..., 0]
            data.create_dataset(v.key, data=arr)

        geom = f.create_group("geometry")
        geom.create_dataset("bounding_box", data=np.asarray(bounding_box, dtype=np.float64))
        geom.create_dataset(
            "cell_counts", data=np.asarray(unpadded_cell_counts, dtype=np.int64)
        )
        holes_group = geom.create_group("holes")
        if holes:
            holes_group.create_dataset(
                "positions", data=np.stack([np.asarray(p) for p, _ in holes])
            )
            holes_group.create_dataset(
                "sizes", data=np.stack([np.asarray(s) for _, s in holes])
            )
        else:
            holes_group.create_dataset("positions", data=np.zeros((0, 3)))
            holes_group.create_dataset("sizes", data=np.zeros((0, 3)))

        grid = f.create_group("grid")
        grid.create_dataset("cell_counts", data=padded.astype(np.int64))
        grid.create_dataset("cell_idx", data=np.asarray(cell_idx, dtype=np.int64))
        bgroup = grid.create_group("boundaries")
        for name, desc in boundaries.items():
            ds = bgroup.create_dataset(name, data=np.asarray(desc["idx"], dtype=np.int64))
            ds.attrs["type"] = desc["type"]
            ds.attrs["start"] = desc.get("start", 0)
            ds.attrs["n"] = len(desc["idx"])
