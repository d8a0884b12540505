"""Voxel-domain -> polyMesh generator: a pure-python blockMesh equivalent.

For this framework's restricted geometries (axis-aligned channel minus
axis-aligned holes at unit cell size) the hex mesh is fully determined by the
boolean voxel domain, so we can emit the complete OpenFOAM polyMesh
(points/faces/owner/neighbour/boundary) directly — no OpenFOAM binary needed.
The output satisfies OpenFOAM's conventions: internal faces first (upper-
triangular order: sorted by owner, then neighbour), boundary faces grouped by
patch, face normals out of the owner cell.

This makes the full L0->L1 pipeline runnable (and testable) offline, which
the reference cannot do (it shells out to dockerized blockMesh,
``scripts/les-template/Allrun``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from .foam_io import (
    write_boundary,
    write_faces,
    write_label_list,
    write_vector_list,
)

_PATCH_TYPES = {"inlets": "patch", "outlets": "patch", "walls": "wall", "empties": "empty"}

# Quad corner offsets (in point-grid coords relative to the face's lower
# corner) for a face with outward normal along +axis / -axis, ordered so the
# right-hand rule gives the outward normal.
_FACE_CORNERS = {
    (0, +1): [(0, 0, 0), (0, 1, 0), (0, 1, 1), (0, 0, 1)],
    (0, -1): [(0, 0, 0), (0, 0, 1), (0, 1, 1), (0, 1, 0)],
    (1, +1): [(0, 0, 0), (0, 0, 1), (1, 0, 1), (1, 0, 0)],
    (1, -1): [(0, 0, 0), (1, 0, 0), (1, 0, 1), (0, 0, 1)],
    (2, +1): [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)],
    (2, -1): [(0, 0, 0), (0, 1, 0), (1, 1, 0), (1, 0, 0)],
}


def build_polymesh(inside: np.ndarray, h: Tuple[float, float, float]):
    """Build mesh arrays from a (nx, ny, nz) bool domain mask.

    Returns (points (P,3) float, faces list[(4,)], owner (F,), neighbour (Fi,),
    patches [(name, type, start, n)], cell_centers (C,3)).
    """
    nx, ny, nz = inside.shape
    cell_id = -np.ones(inside.shape, dtype=np.int64)
    cell_id[inside] = np.arange(inside.sum())

    # Point grid ids (raveled over the (nx+1, ny+1, nz+1) lattice).
    P = (nx + 1, ny + 1, nz + 1)

    def pid(px, py, pz):
        return (px * P[1] + py) * P[2] + pz

    internal: List[Tuple[int, int, Tuple[int, ...]]] = []  # (owner, neigh, quad)
    patches: Dict[str, List[Tuple[int, Tuple[int, ...]]]] = {
        "inlets": [],
        "outlets": [],
        "walls": [],
        "empties": [],
    }
    two_d_axes = [a for a in range(3) if inside.shape[a] == 1]

    def face_quad(cell: Tuple[int, int, int], axis: int, sign: int) -> Tuple[int, ...]:
        # Lower corner of the face in point coords.
        base = list(cell)
        if sign > 0:
            base[axis] += 1
        quad = []
        for off in _FACE_CORNERS[(axis, sign)]:
            p = [base[0] + off[0], base[1] + off[1], base[2] + off[2]]
            # off coordinates are expressed in the two in-plane axes: remap
            quad.append(tuple(p))
        return tuple(pid(*p) for p in quad)

    # Iterate cells; for each axis look at +1 neighbor for internal faces and
    # at both sides for boundary faces.
    coords = np.argwhere(inside)
    for (cx, cy, cz) in coords:
        me = cell_id[cx, cy, cz]
        for axis in range(3):
            for sign in (+1, -1):
                n = [cx, cy, cz]
                n[axis] += sign
                in_bounds = 0 <= n[axis] < inside.shape[axis]
                neighbor = cell_id[tuple(n)] if in_bounds and inside[tuple(n)] else -1
                if neighbor >= 0:
                    if sign > 0:  # emit internal faces once, from the lower cell
                        quad = face_quad((cx, cy, cz), axis, +1)
                        internal.append((me, neighbor, quad))
                    continue
                # boundary face
                quad = face_quad((cx, cy, cz), axis, sign)
                if axis == 0 and sign < 0 and cx == 0:
                    patch = "inlets"
                elif axis == 0 and sign > 0 and cx == nx - 1:
                    patch = "outlets"
                elif axis in two_d_axes:
                    patch = "empties"
                else:
                    patch = "walls"
                patches[patch].append((me, quad))

    # Order: internal faces sorted by (owner, neighbour); then patches.
    internal.sort(key=lambda t: (t[0], t[1]))
    faces = [t[2] for t in internal]
    owner = [t[0] for t in internal]
    neighbour = [t[1] for t in internal]
    patch_table = []
    for name in ("inlets", "outlets", "walls", "empties"):
        entries = patches[name]
        if not entries:
            continue
        patch_table.append((name, _PATCH_TYPES[name], len(faces), len(entries)))
        for own, quad in entries:
            faces.append(quad)
            owner.append(own)

    # Compact the point table to used points only.
    used = sorted({p for quad in faces for p in quad})
    remap = {p: i for i, p in enumerate(used)}
    faces = [tuple(remap[p] for p in quad) for quad in faces]
    used = np.asarray(used)
    pz = used % P[2]
    py = (used // P[2]) % P[1]
    px = used // (P[1] * P[2])
    points = np.stack([px * h[0], py * h[1], pz * h[2]], axis=-1).astype(np.float64)

    centers = (coords + 0.5) * np.asarray(h)

    return points, faces, np.asarray(owner), np.asarray(neighbour), patch_table, centers


def write_polymesh(case_dir: Path, inside: np.ndarray, h: Tuple[float, float, float]):
    """Write constant/polyMesh for the voxel domain; returns cell centers."""
    points, faces, owner, neighbour, patch_table, centers = build_polymesh(inside, h)
    mesh_dir = Path(case_dir) / "constant" / "polyMesh"
    mesh_dir.mkdir(parents=True, exist_ok=True)
    write_vector_list(mesh_dir / "points", "points", "vectorField", points)
    write_faces(mesh_dir / "faces", faces)
    write_label_list(mesh_dir / "owner", "owner", owner)
    write_label_list(mesh_dir / "neighbour", "neighbour", neighbour)
    write_boundary(mesh_dir / "boundary", patch_table)
    return centers
