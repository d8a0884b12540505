"""Device meshes and sharding layout.

The parallelism model is TPU-native SPMD: build a ``jax.sharding.Mesh`` with
axes ``("dp", "sp")`` — data parallelism over the batch of frames (batches are
geometry-pure, so each replica sees whole cases; the one-geometry-per-batch
invariant of the reference maps cleanly onto replicas) and spatial
parallelism over the channel (x) axis of the voxel grid.  Inputs are placed
with `NamedSharding`s; XLA's SPMD partitioner inserts the collectives (psum
for gradients, halo exchanges for spatially-sharded convolutions).

The reference trains single-device only (``config/train.yaml:25``); this
module is the distributed runtime it lacks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Optional[Tuple[int, int]] = None) -> Optional[Mesh]:
    """Create a (dp, sp) mesh.  shape=None -> None (single-device fast path).

    shape=(dp, sp) must multiply to <= len(jax.devices()); use
    (n_devices, 1) for pure data parallelism.
    """
    if shape is None:
        return None
    dp, sp = shape
    devices = np.asarray(jax.devices()[: dp * sp]).reshape(dp, sp)
    return Mesh(devices, axis_names=("dp", "sp"))


def batch_spec() -> P:
    """Cells (B, n_cells, F): batch over dp; cell axis stays replicated
    (the scatter target gets the spatial sharding instead)."""
    return P("dp", None, None)


def grid_partition() -> P:
    """Dense grids (B, X, Y, Z, F): batch over dp, grid-x over sp."""
    return P("dp", "sp", None, None, None)


def shard_batch_arrays(mesh: Optional[Mesh], cells, grid):
    """Place a batch on the mesh: cells sharded over dp, grid maps replicated."""
    if mesh is None:
        return cells, grid
    cells = jax.device_put(cells, NamedSharding(mesh, batch_spec()))
    grid = jax.device_put(grid, NamedSharding(mesh, P()))
    return cells, grid


def replicate(mesh: Optional[Mesh], tree):
    if mesh is None:
        return tree
    return jax.device_put(tree, NamedSharding(mesh, P()))


def constrain_dense(mesh: Optional[Mesh], x):
    """Inside-jit sharding constraint for dense (B, X, Y, Z, F) activations."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, grid_partition()))
