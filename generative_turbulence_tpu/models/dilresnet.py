"""DilResNet: dilated-CNN autoregressive baseline.

encode conv -> N residual blocks of 7 convs with dilations [1,2,4,8,4,2,1]
(+ local conditioning added before each block) -> decode conv.  Matches the
architecture of ``turbdiff/models/dilresnet.py:21-94``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .blocks import Conv3d
from .conditioning import Conditioning


class DilatedBlock(nn.Module):
    dim: int
    dilations: Sequence[int] = (1, 2, 4, 8)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        schedule = list(self.dilations) + list(reversed(self.dilations[:-1]))
        for d in schedule:
            x = Conv3d(self.dim, 3, dilation=d, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class DilResNet(nn.Module):
    n_features: int
    N: int = 4
    hidden_dim: int = 48
    conditioning: Optional[Conditioning] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, cell_types: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """x: (B, X, Y, Z, F) -> (B, X, Y, Z, F) predicted (normalized) delta."""
        c_local = None
        if self.conditioning is not None and cell_types is not None:
            c = self.conditioning(cell_types)
            c_local = Conv3d(self.hidden_dim, 3, dtype=self.dtype, name="encode_c_local")(
                c[None]
            )

        x = Conv3d(self.hidden_dim, 3, dtype=self.dtype, name="encode")(x)
        for i in range(self.N):
            if c_local is not None:
                x = x + c_local
            x = x + DilatedBlock(self.hidden_dim, dtype=self.dtype, name=f"block_{i}")(x)
        return Conv3d(self.n_features, 3, dtype=jnp.float32, name="decode")(
            x.astype(jnp.float32)
        )
