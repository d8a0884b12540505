"""OpenFOAM case -> ``data.h5`` conversion + sparse->dense grid mapping.

``foam_case_to_h5`` is the counterpart of the reference's ``scripts/
foam2h5.py`` (mesh + per-time fields + boundary conditions -> HDF5), built on
the self-contained foam_io readers instead of fluidfoam; ``add_grid_embedding``
is the counterpart of ``scripts/grid-embedding.py`` (cell centroids -> padded
integer grid indices, boundary faces -> padding-cell indices via face
orientation).
"""

from __future__ import annotations

import json
import re
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from ..utils.index import ravel_multi_index
from .foam_dicts import parse_foam_file
from .foam_io import (
    read_boundary,
    read_boundary_conditions,
    read_faces,
    read_internal_field,
    read_label_list,
    read_vector_list,
)

FIELD_NAMES = ("U", "p", "k", "nut")


def _time_dirs(case_dir: Path) -> List[Tuple[float, Path]]:
    out = []
    for child in Path(case_dir).iterdir():
        if not child.is_dir():
            continue
        if re.fullmatch(r"\d+(\.\d+)?([eE][-+]?\d+)?", child.name):
            out.append((float(child.name), child))
    return sorted(out)


def read_mesh(case_dir: Path):
    mesh_dir = Path(case_dir) / "constant" / "polyMesh"
    points = read_vector_list(mesh_dir / "points")
    faces = read_faces(mesh_dir / "faces")
    owner = read_label_list(mesh_dir / "owner")
    neighbour = read_label_list(mesh_dir / "neighbour")
    boundary = read_boundary(mesh_dir / "boundary")
    return points, faces, owner, neighbour, boundary


def cell_face_table(faces, owner, neighbour, n_cells: int) -> List[np.ndarray]:
    """Per-cell face-id lists (owner faces first, then neighbour faces, each
    in ascending face order — the original append order), vectorized."""
    owner = np.asarray(owner, dtype=np.int64)
    neighbour = np.asarray(neighbour, dtype=np.int64)
    cf = np.concatenate([owner, neighbour])
    fi = np.concatenate(
        [np.arange(len(owner), dtype=np.int64), np.arange(len(neighbour), dtype=np.int64)]
    )
    order = np.argsort(cf, kind="stable")
    counts = np.bincount(cf, minlength=n_cells)
    return np.split(fi[order], np.cumsum(counts)[:-1])


def cell_centroids(points, faces, cells, owner=None, neighbour=None) -> np.ndarray:
    """Cell centroid, exact for our axis-aligned hexes.

    Every vertex of a hex belongs to exactly 3 of its 6 quads, so the mean
    over the 24 face-corner points (with multiplicity) equals the mean over
    the 8 unique vertices; the centroid is therefore the mean of the cell's
    face centers — computable with two vectorized scatter-adds instead of a
    per-cell ``np.unique`` loop."""
    if owner is not None:
        faces = np.asarray(faces)
        fc = points[faces].mean(axis=1)  # (F, 3) face centers
        n_cells = len(cells)
        acc = np.zeros((n_cells, 3))
        cnt = np.zeros(n_cells)
        np.add.at(acc, owner, fc)
        np.add.at(cnt, owner, 1.0)
        n_int = len(neighbour)
        np.add.at(acc, neighbour, fc[:n_int])
        np.add.at(cnt, neighbour, 1.0)
        return acc / cnt[:, None]
    # generic fallback (non-hex meshes / no owner info): unique-vertex mean
    out = np.zeros((len(cells), 3))
    for ci, face_ids in enumerate(cells):
        vids = np.unique(np.concatenate([np.asarray(faces[fi]) for fi in face_ids]))
        out[ci] = points[vids].mean(axis=0)
    return out


def read_nu(case_dir: Path) -> float:
    for name in ("physicalProperties", "transportProperties"):
        f = Path(case_dir) / "constant" / name
        if f.is_file():
            d = parse_foam_file(f)
            nu = d.get("nu")
            if nu is not None:
                value = getattr(nu, "value", nu)
                return float(value)
    raise FileNotFoundError(f"No viscosity found in {case_dir}/constant")


def boundary_dict_from_patch_table(patch_table) -> Dict[str, Dict]:
    """``build_polymesh`` patch table -> the dict ``read_boundary`` returns."""
    return {
        name: {"type": typch, "startFace": int(start), "nFaces": int(n)}
        for name, typch, start, n in patch_table
    }


def foam_case_to_h5(
    case_dir: Path,
    out_file: Optional[Path] = None,
    *,
    drop_first_time: bool = True,
    n_workers: int = 8,
    frames_override: Optional[List[Dict[str, np.ndarray]]] = None,
    times_override: Optional[List[float]] = None,
    mesh_override: Optional[tuple] = None,
) -> Path:
    """Convert a solved OpenFOAM case into the ``data.h5`` schema.

    Writes: physical@nu, domain/{points,faces,face2cell,cells}@boundaries,
    boundary-conditions/<var>/<boundary>, data/times + data/{u,p,k,nut}.
    The first written time directory is dropped by default (k/nut are not yet
    initialized there, matching ``scripts/foam2h5.py:126``).
    """
    case_dir = Path(case_dir)
    out_file = Path(out_file) if out_file else case_dir / "data.h5"

    if mesh_override is not None:
        # In-memory mesh from ``build_polymesh`` — skips the ASCII polyMesh
        # write + re-parse round-trip (minutes per shapes-size case).
        points, faces, owner, neighbour, patch_table, _ = mesh_override
        boundary = boundary_dict_from_patch_table(patch_table)
    else:
        points, faces, owner, neighbour, boundary = read_mesh(case_dir)
    n_cells = int(max(owner.max(), neighbour.max() if len(neighbour) else 0)) + 1
    cells = cell_face_table(faces, owner, neighbour, n_cells)

    if isinstance(faces, np.ndarray):
        assert faces.shape[1] == 4, "channel meshes must be quad-faced"
    else:
        for f in faces:
            assert len(f) == 4, "channel meshes must be quad-faced"

    if frames_override is not None:
        assert times_override is not None and len(times_override) == len(
            frames_override
        )
        times = [(t, None) for t in times_override]
    else:
        times = [(t, d) for t, d in _time_dirs(case_dir) if t > 0]
        if drop_first_time and len(times) > 1:
            times = times[1:]
        assert times, f"no solved time directories in {case_dir}"

    # Boundary conditions from the initial-condition dicts in 0/.
    zero_dir = case_dir / "0"
    bcs: Dict[str, Dict[str, Dict]] = {}
    for field in FIELD_NAMES:
        f = zero_dir / field
        if f.is_file():
            bcs[field.lower()] = read_boundary_conditions(f)

    # Read all time steps of each field (threaded: h5/file I/O bound).
    def read_time(args):
        _, tdir = args
        out = {}
        for field in FIELD_NAMES:
            f = tdir / field
            if f.is_file():
                out[field.lower()] = read_internal_field(f, n_cells)
        return out

    if frames_override is not None:
        frames = frames_override
    else:
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            frames = list(pool.map(read_time, times))

    face2cell = np.full((len(faces), 2), -1, dtype=np.int64)
    face2cell[:, 0] = owner
    face2cell[: len(neighbour), 1] = neighbour

    if isinstance(faces, np.ndarray):
        faces_arr = faces.astype(np.int64, copy=False)
    else:
        max_face_len = max(len(f) for f in faces)
        faces_arr = np.full((len(faces), max_face_len), -1, dtype=np.int64)
        for i, f in enumerate(faces):
            faces_arr[i, : len(f)] = f
    lens = np.fromiter((len(c) for c in cells), dtype=np.int64, count=n_cells)
    max_cell_faces = int(lens.max())
    cells_arr = np.full((n_cells, max_cell_faces), -1, dtype=np.int64)
    if (lens == max_cell_faces).all():
        cells_arr[:] = np.concatenate(cells).reshape(n_cells, max_cell_faces)
    else:
        for i, c in enumerate(cells):
            cells_arr[i, : len(c)] = c

    with h5py.File(out_file, "w") as f:
        f.create_group("physical").attrs["nu"] = read_nu(case_dir)

        dom = f.create_group("domain")
        dom.create_dataset("points", data=points)
        dom.create_dataset("faces", data=faces_arr)
        dom.create_dataset("face2cell", data=face2cell)
        dom.create_dataset("cells", data=cells_arr)
        dom.attrs["boundaries"] = json.dumps(
            {name: {"type": spec["type"], "startFace": spec["startFace"],
                    "nFaces": spec["nFaces"]} for name, spec in boundary.items()}
        )

        bc_group = f.create_group("boundary-conditions")
        for var, patches in bcs.items():
            var_group = bc_group.create_group(var)
            for patch, spec in patches.items():
                if spec["type"] == "empty":
                    continue
                g = var_group.create_group(patch)
                g.attrs["type"] = spec["type"]
                if spec["type"] == "fixed-value" and spec["value"] is not None:
                    value = spec["value"]
                    g.create_dataset(
                        "value",
                        data=value if len(value) > 1 else np.float32(value[0]),
                    )

        data = f.create_group("data")
        data.create_dataset("times", data=np.asarray([t for t, _ in times]))
        for field in FIELD_NAMES:
            key = field.lower()
            stack = np.stack([fr[key] for fr in frames if key in fr])
            if stack.shape[-1] == 1:
                stack = stack[..., 0]
            data.create_dataset(key, data=stack.astype(np.float32))

    return out_file


def add_grid_embedding(
    h5_file: Path,
    case_dir: Path,
    mesh_params: Optional[dict] = None,
    mesh_override: Optional[tuple] = None,
):
    """Append the ``grid/`` and ``geometry/`` groups to a converted case.

    Maps cell centroids to integer indices on the PADDED grid (+1 offset per
    axis) and boundary faces to their adjacent padding cells via the dominant
    face-normal axis — the semantics of ``scripts/grid-embedding.py:38-90``.
    """
    case_dir = Path(case_dir)
    if mesh_params is None:
        params_file = case_dir / "mesh-params.json"
        mesh_params = json.loads(params_file.read_text())

    cell_counts = np.asarray(mesh_params["cell_counts"], dtype=np.int64)
    h = np.asarray(mesh_params["h"], dtype=np.float64)
    padded = tuple(cell_counts + 2)

    if mesh_override is not None:
        points, faces, owner, neighbour, patch_table, centroids = mesh_override
        boundary = boundary_dict_from_patch_table(patch_table)
    else:
        points, faces, owner, neighbour, boundary = read_mesh(case_dir)
        n_cells = int(max(owner.max(), neighbour.max() if len(neighbour) else 0)) + 1
        cells = cell_face_table(faces, owner, neighbour, n_cells)
        centroids = cell_centroids(points, faces, cells, owner, neighbour)
    faces = np.asarray(faces)
    owner = np.asarray(owner)

    grid_coords = np.floor(centroids / h).astype(np.int64) + 1  # +1 padding
    cell_idx = ravel_multi_index(grid_coords, padded)

    # Boundary faces -> padding cells: step from the owning cell along the
    # dominant outward normal axis (vectorized per patch).
    boundary_idx: Dict[str, np.ndarray] = {}
    for name, spec in boundary.items():
        start, n = spec["startFace"], spec["nFaces"]
        own = owner[start : start + n]
        face_centers = points[faces[start : start + n]].mean(axis=1)  # (n, 3)
        direction = (face_centers - centroids[own]) / h
        axis = np.argmax(np.abs(direction), axis=1)
        step = np.where(direction[np.arange(n), axis] > 0, 1, -1)
        coord = grid_coords[own].copy()
        coord[np.arange(n), axis] += step
        boundary_idx[name] = np.unique(ravel_multi_index(coord, padded))

    holes = mesh_params.get("holes", [])
    with h5py.File(h5_file, "a") as f:
        for group in ("grid", "geometry"):
            if group in f:
                del f[group]
        geom = f.create_group("geometry")
        geom.create_dataset(
            "bounding_box", data=np.asarray(mesh_params["bounding_box"])
        )
        geom.create_dataset("cell_counts", data=cell_counts)
        holes_group = geom.create_group("holes")
        if holes:
            holes_group.create_dataset(
                "positions", data=np.asarray([hle["position"] for hle in holes])
            )
            holes_group.create_dataset(
                "sizes", data=np.asarray([hle["size"] for hle in holes])
            )
        else:
            holes_group.create_dataset("positions", data=np.zeros((0, 3)))
            holes_group.create_dataset("sizes", data=np.zeros((0, 3)))

        grid = f.create_group("grid")
        grid.create_dataset("cell_counts", data=np.asarray(padded, dtype=np.int64))
        grid.create_dataset("cell_idx", data=cell_idx)
        bgroup = grid.create_group("boundaries")
        for name, spec in boundary.items():
            kind = {"patch": name, "wall": "walls", "empty": "empties"}.get(
                spec.get("type"), name
            )
            ds = bgroup.create_dataset(name, data=boundary_idx[name])
            ds.attrs["type"] = kind if isinstance(kind, str) else name
            ds.attrs["start"] = spec["startFace"]
            ds.attrs["n"] = spec["nFaces"]
    return h5_file
