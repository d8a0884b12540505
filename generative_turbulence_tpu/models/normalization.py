"""Field normalization for channels-last grids.

With channels last, (mean, std) broadcast over the trailing feature axis with
no reshaping — one fused multiply-add per direction (reference equivalent:
``turbdiff/models/normalization.py:13-41``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..data.schema import FieldStats
from ..data.variables import Variable


@dataclasses.dataclass(frozen=True)
class Normalizer:
    mean: np.ndarray  # (F,)
    std: np.ndarray  # (F,)

    @staticmethod
    def from_stats(
        stats: FieldStats, variables: Sequence[Variable], mode: str
    ) -> "Normalizer":
        mean, std = stats.normalizers(variables, mode)
        return Normalizer(mean=mean, std=std)

    def normalize(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.mean, dtype=x.dtype)
        std = jnp.asarray(self.std, dtype=x.dtype)
        return (x - mean) / std

    def denormalize(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.mean, dtype=x.dtype)
        std = jnp.asarray(self.std, dtype=x.dtype)
        return x * std + mean
