"""Geometry conditioning features.

Builds the local conditioning grid for a case: a learned (or one-hot)
embedding of the 6 cell types plus optional normalized cell positions.
In the functional design the embedding parameters live inside the model that
consumes them, so ``Conditioning`` is a flax module mapping the integer
cell-type grid to a feature grid.

Reference semantics: ``turbdiff/models/conditioning.py:15-93`` and
``turbdiff/models/cell_type_embeddings.py:14-84``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..data.schema import N_CELL_TYPES


class Conditioning(nn.Module):
    """cell_types (X, Y, Z) int32 -> c_local (X, Y, Z, C) features (no batch axis:
    conditioning is shared across the batch since batches are geometry-pure)."""

    cell_type_features: bool = True
    cell_type_embedding: str = "learned"  # or "onehot"
    cell_type_embedding_dim: int = 4
    cell_pos_features: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def out_dim(self) -> int:
        dim = 0
        if self.cell_type_features:
            dim += (
                self.cell_type_embedding_dim
                if self.cell_type_embedding == "learned"
                else N_CELL_TYPES
            )
        if self.cell_pos_features:
            dim += 3
        return dim

    @nn.compact
    def __call__(self, cell_types: jnp.ndarray) -> Optional[jnp.ndarray]:
        parts = []
        if self.cell_type_features:
            if self.cell_type_embedding == "learned":
                emb = nn.Embed(
                    N_CELL_TYPES,
                    self.cell_type_embedding_dim,
                    dtype=self.dtype,
                    name="cell_type_embedding",
                )
                parts.append(emb(cell_types))
            elif self.cell_type_embedding == "onehot":
                parts.append(
                    jnp.eye(N_CELL_TYPES, dtype=self.dtype)[cell_types]
                )
            else:
                raise ValueError(
                    f"Unknown cell type embedding {self.cell_type_embedding!r}"
                )
        if self.cell_pos_features:
            X, Y, Z = cell_types.shape
            pos = jnp.stack(
                jnp.meshgrid(
                    jnp.linspace(0.0, 1.0, X),
                    jnp.linspace(0.0, 1.0, Y),
                    jnp.linspace(0.0, 1.0, Z),
                    indexing="ij",
                ),
                axis=-1,
            ).astype(self.dtype)
            parts.append(pos)
        if not parts:
            return None
        return jnp.concatenate(parts, axis=-1)
