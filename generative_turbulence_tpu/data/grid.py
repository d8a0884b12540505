"""Sparse <-> dense grid embedding as jittable XLA scatter/gather.

The simulation stores only in-domain cell values (``(B, n_cells, F)``).  The
models operate on dense padded voxel grids (``(B, X, Y, Z, F)`` channels-last).
``GridMap`` packages the static per-case index arrays needed to move between
the two representations; it is a pytree so it can be a jit argument without
recompilation across batches of the same geometry (shapes stay static per
case; across the 45 shapes cases only the *contents* of ``cell_idx`` differ,
so one compiled program serves all cases).

Equivalent semantics to ``turbdiff/data/ofles.py:220-240`` (grid_embedding),
``turbdiff/models/utils.py:8-28`` (select/where_cells) and
``turbdiff/models/cell_type_embeddings.py:47-58`` (cell types), re-designed
around XLA scatter instead of in-place tensor mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schema import CaseMetadata
from .variables import Variable, total_dims


class _GridMapLRU:
    """LRU cache of device-resident GridMaps, bounded in BYTES (not entries):
    each entry pins ~4 MB of index tables in HBM, and a wholesale clear would
    force every live case to re-upload its indices over the (slow) tunnel."""

    def __init__(self, max_bytes: int = 512 * 1024 * 1024):
        from collections import OrderedDict

        self.max_bytes = max_bytes
        self._entries: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._total = 0

    @staticmethod
    def _nbytes(grid) -> int:
        return sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a in (
                grid.cell_idx,
                grid.dirichlet_idx,
                grid.dirichlet_vals,
                grid.cell_types,
                grid.inside_mask,
            )
        )

    def get(self, key):
        hit = self._entries.get(key)
        if hit is None:
            return None
        self._entries.move_to_end(key)
        return hit[0]

    def put(self, key, grid):
        nbytes = self._nbytes(grid)
        old = self._entries.pop(key, None)
        if old is not None:
            self._total -= old[1]
        self._entries[key] = (grid, nbytes)
        self._total += nbytes
        while self._total > self.max_bytes and len(self._entries) > 1:
            _, (_, evicted) = self._entries.popitem(last=False)
            self._total -= evicted

    def clear(self):
        self._entries.clear()
        self._total = 0

    def __len__(self):
        return len(self._entries)


_GRIDMAP_CACHE = _GridMapLRU()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GridMap:
    """Static index arrays of one case geometry for a fixed variable tuple.

    Leaves (device arrays):
      cell_idx        (N,)   int32 flat indices of in-domain cells
      dirichlet_idx   (M,)   int32 flat indices of fixed-value boundary cells
      dirichlet_vals  (M, F) float32 boundary values (stacked channels)
      cell_types      (X, Y, Z) int32 cell-type ids
      inside_mask     (X, Y, Z) bool
      h               (3,)  float32 physical cell size

    Static (aux) data: padded grid shape and channel count.
    """

    cell_idx: jnp.ndarray
    dirichlet_idx: jnp.ndarray
    dirichlet_vals: jnp.ndarray
    cell_types: jnp.ndarray
    inside_mask: jnp.ndarray
    h: jnp.ndarray
    shape: Tuple[int, int, int]
    n_features: int
    # TRUE cell count as a () int32 LEAF (not static aux): loss normalizers
    # divide by it inside jit, and baking it as a constant would re-specialize
    # the compiled program per case — exactly what bucketing exists to avoid.
    n_valid: Optional[jnp.ndarray] = None
    # static: whether the index tables carry bucket padding (sentinel rows);
    # constant per run config, so it is safe as compile-time aux.
    bucketed: bool = False

    @staticmethod
    def from_metadata(
        meta: CaseMetadata,
        variables: Sequence[Variable],
        *,
        cached: bool = True,
        bucket: int = 0,
    ) -> "GridMap":
        """Build (or fetch) the device-resident index maps for a case.

        Cached per (case file, variables, bucket): the arrays are static per
        geometry, so re-uploading ~4 MB of indices every batch would waste
        host->device bandwidth on every training step.

        ``bucket`` rounds the cell and Dirichlet index tables UP to a multiple
        of this granularity, padding with OUT-OF-RANGE sentinel indices
        (scatter drops them, gather fills zeros).  Cases whose counts land in
        the same bucket then share ONE compiled program — without bucketing,
        every case costs a fresh XLA compile, which on slow-compile backends
        dominates the first epoch (the 45-shape dataset spans 30 distinct
        cell counts within a 2% band).
        """
        if cached:
            key = (str(meta.file), tuple(v.key for v in variables), bucket)
            hit = _GRIDMAP_CACHE.get(key)
            if hit is not None:
                return hit
            grid = GridMap.from_metadata(
                meta, variables, cached=False, bucket=bucket
            )
            _GRIDMAP_CACHE.put(key, grid)
            return grid
        d_idx, d_vals = meta.dirichlet_table(variables)
        cell_idx = np.asarray(meta.cell_idx, dtype=np.int32)
        n_valid = int(cell_idx.shape[0])
        sentinel = int(np.prod(meta.cell_counts))  # out of range -> drop/fill
        if bucket:
            pad_to = -(-n_valid // bucket) * bucket
            cell_idx = np.concatenate(
                [cell_idx, np.full(pad_to - n_valid, sentinel, np.int32)]
            )
        d_idx = np.asarray(d_idx, dtype=np.int32)
        d_vals = np.asarray(d_vals, dtype=np.float32)
        if bucket:
            m = d_idx.shape[0]
            pad_d = -(-m // bucket) * bucket if m else 0
            d_idx = np.concatenate(
                [d_idx, np.full(pad_d - m, sentinel, np.int32)]
            )
            d_vals = np.concatenate(
                [d_vals, np.zeros((pad_d - m, d_vals.shape[1]), np.float32)]
            )
        return GridMap(
            cell_idx=jnp.asarray(cell_idx),
            dirichlet_idx=jnp.asarray(d_idx),
            dirichlet_vals=jnp.asarray(d_vals),
            cell_types=jnp.asarray(meta.cell_types, dtype=jnp.int32),
            inside_mask=jnp.asarray(meta.inside_mask),
            h=jnp.asarray(meta.h, dtype=jnp.float32),
            shape=tuple(int(c) for c in meta.cell_counts),
            n_features=total_dims(variables),
            n_valid=jnp.asarray(n_valid, dtype=jnp.int32),
            bucketed=bucket > 0,
        )

    # pytree protocol ------------------------------------------------------

    def tree_flatten(self):
        leaves = (
            self.cell_idx,
            self.dirichlet_idx,
            self.dirichlet_vals,
            self.cell_types,
            self.inside_mask,
            self.h,
            self.n_valid,
        )
        aux = (self.shape, self.n_features, self.bucketed)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        shape, n_features, bucketed = aux
        *arrays, n_valid = leaves
        return cls(
            *arrays,
            shape=shape,
            n_features=n_features,
            n_valid=n_valid,
            bucketed=bucketed,
        )

    @property
    def n_cells(self) -> int:
        """TRUE in-domain cell count (host-side; excludes bucket padding).
        Inside jit use ``grid.n_valid`` (a traced scalar) instead."""
        if self.n_valid is not None:
            return int(self.n_valid)
        return int(self.cell_idx.shape[0])


def embed_cells(values: jnp.ndarray, grid: GridMap) -> jnp.ndarray:
    """Scatter per-cell values into a dense padded grid.

    values: (..., n_cells, F)  ->  (..., X, Y, Z, F)

    Out-of-domain cells are zero except fixed-value (Dirichlet) boundary cells,
    which receive their prescribed values.
    """
    X, Y, Z = grid.shape
    F = values.shape[-1]
    batch_shape = values.shape[:-2]
    flat = jnp.zeros((*batch_shape, X * Y * Z, F), dtype=values.dtype)
    # mode="drop": bucket-padded index tables carry out-of-range sentinels.
    # unique_indices only when unpadded: padding repeats the sentinel, and
    # promising uniqueness with duplicates present is undefined behavior.
    flat = flat.at[..., grid.cell_idx, :].set(
        values, unique_indices=not grid.bucketed, mode="drop"
    )
    if grid.dirichlet_idx.shape[0] > 0:
        vals = grid.dirichlet_vals.astype(values.dtype)
        vals = jnp.broadcast_to(vals, (*batch_shape, *vals.shape))
        flat = flat.at[..., grid.dirichlet_idx, :].set(vals, mode="drop")
    return flat.reshape(*batch_shape, X, Y, Z, F)


def gather_cells(x: jnp.ndarray, grid: GridMap) -> jnp.ndarray:
    """Gather in-domain cell values from a dense grid.

    x: (..., X, Y, Z, F)  ->  (..., n_cells_padded, F); bucket-padding rows
    (out-of-range sentinel indices) read as zeros.
    """
    flat = ravel_grid(x)
    return jnp.take(flat, grid.cell_idx, axis=-2, mode="fill", fill_value=0)


def gather_at(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather arbitrary flat indices from a dense (..., X, Y, Z, F) grid."""
    return ravel_grid(x)[..., idx, :]


def ravel_grid(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten the 3 spatial axes of a channels-last grid: (..., X,Y,Z,F) -> (..., XYZ, F)."""
    *batch, X, Y, Z, F = x.shape
    return x.reshape(*batch, X * Y * Z, F)


def unravel_grid(x: jnp.ndarray, shape: Tuple[int, int, int]) -> jnp.ndarray:
    *batch, _, F = x.shape
    X, Y, Z = shape
    return x.reshape(*batch, X, Y, Z, F)


def scatter_cells_into(
    target: jnp.ndarray, source: jnp.ndarray, grid: GridMap
) -> jnp.ndarray:
    """Replace the in-domain cells of ``target`` with those of ``source``.

    Both are dense grids (..., X, Y, Z, F).  Equivalent to the reference's
    ``where_cells(cell_idx, source, target)`` but expressed as a masked select,
    which XLA fuses into surrounding elementwise work instead of a scatter.
    """
    mask = grid.inside_mask[..., None]
    return jnp.where(mask, source, target)


def apply_inside(x: jnp.ndarray, grid: GridMap) -> jnp.ndarray:
    """Zero out everything but the in-domain cells (``where_cells`` with no other)."""
    return jnp.where(grid.inside_mask[..., None], x, jnp.zeros((), dtype=x.dtype))


def masked_mean(
    x: jnp.ndarray, grid: GridMap, *, batch_ndim: int = 1
) -> jnp.ndarray:
    """Mean of ``x`` over in-domain cells and channels, keeping leading batch axes.

    x: (B..., X, Y, Z, F) -> (B...,).  Used for the in-domain-restricted loss
    (reference ``ddpm.py:845-850``).
    """
    mask = grid.inside_mask[..., None].astype(x.dtype)
    total = jnp.sum(x * mask, axis=tuple(range(batch_ndim, x.ndim)))
    # TRUE in-domain cells x channels, as a traced scalar (see GridMap.n_valid)
    n = grid.n_valid.astype(x.dtype) * x.shape[-1]
    return total / n
