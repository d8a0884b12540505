"""The epsilon-network: a FiLM-conditioned 3D U-Net over voxel grids.

Structure mirrors the reference ``DenoisingModel`` (``turbdiff/models/
ddpm.py:398-505``): 1x1 input encoding to ``dim`` channels, geometry
conditioning encoded and concatenated into the first level, a timestep (+
optional global/geometry) embedding processed by an MLP feeding every
ResnetBlock as FiLM, interpolation U-Net with bottleneck attention, and a
resnet + 1x1 decode head.  Re-designed functional/channels-last for TPU.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from .blocks import ResnetBlock, UNet
from .conditioning import Conditioning
from .embeddings import NyquistFrequencyEmbedding, SinusoidalTimeEmbedding

ACTIVATIONS = {
    "silu": nn.silu,
    "gelu": nn.gelu,
    "relu": nn.relu,
    "softplus": nn.softplus,
    "tanh": nn.tanh,
}


class GeometryEmbedding(nn.Module):
    """Global conditioning vector from the front slice of the local
    conditioning (off by default; ``ddpm.py:375-395``)."""

    features: int
    actfn: Callable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, c_local: jnp.ndarray) -> jnp.ndarray:
        # Front region containing the obstacle.  All convs use VALID padding
        # (torch Conv3d's default, ``ddpm.py:383-389``).
        n = min(50, c_local.shape[-4])
        x = c_local[..., :n, :, :, :]
        if x.ndim == 4:
            x = x[None]
        x = nn.Conv(
            self.features, (5, 5, 5), strides=(5, 5, 5), padding="VALID",
            dtype=self.dtype, name="conv0",
        )(x)
        x = self.actfn(x)
        x = nn.Conv(
            self.features, (5, 5, 5), strides=(1, 1, 1), padding="VALID",
            dtype=self.dtype, name="conv1",
        )(x)
        x = self.actfn(x)
        x = nn.Conv(
            self.features, (5, 5, 5), strides=(5, 5, 5), padding="VALID",
            dtype=self.dtype, name="conv2",
        )(x)
        return x.mean(axis=(-4, -3, -2))


class DenoisingModel(nn.Module):
    out_features: int
    timesteps: int
    dim: int = 32
    u_net_levels: int = 4
    actfn_name: str = "silu"
    norm_type: str = "group"
    time_embedding: str = "nyquist"
    attention_kind: str = "full"
    with_geometry_embedding: bool = False
    remat: bool = False
    conditioning: Optional[Conditioning] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        cell_types: Optional[jnp.ndarray] = None,
        c_global: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """
        x:          (B, X, Y, Z, F) noisy normalized fields
        t:          (B,) integer timesteps
        cell_types: (X, Y, Z) int32 (shared across the geometry-pure batch)
        c_global:   optional (B, G) global features
        """
        actfn = ACTIVATIONS[self.actfn_name]
        B = x.shape[0]

        c_local = None
        if self.conditioning is not None and cell_types is not None:
            c_local = self.conditioning(cell_types)  # (X, Y, Z, Cc)

        # Conditioning vector: time embedding (+ global / geometry parts),
        # processed by an MLP; feeds every ResnetBlock as FiLM.
        if self.time_embedding == "nyquist":
            t_emb = NyquistFrequencyEmbedding(self.dim, self.timesteps)(
                t.astype(jnp.float32)
            )
        elif self.time_embedding == "sinusoidal":
            t_emb = SinusoidalTimeEmbedding(self.dim)(t.astype(jnp.float32))
        else:
            raise ValueError(f"Unknown time embedding {self.time_embedding!r}")
        if self.dtype is not None:
            t_emb = t_emb.astype(self.dtype)

        c_parts = [t_emb]
        if c_global is not None:
            c_parts.append(
                nn.Dense(self.dim, dtype=self.dtype, name="encode_c_global")(c_global)
            )
        if self.with_geometry_embedding and c_local is not None:
            g = GeometryEmbedding(
                self.dim, actfn, dtype=self.dtype, name="geometry_embedding"
            )(c_local)
            c_parts.append(jnp.broadcast_to(g, (B, self.dim)))
        c = jnp.concatenate(c_parts, axis=-1)
        c_dim = c.shape[-1]
        c = nn.Dense(4 * c_dim, dtype=self.dtype, name="process_c_0")(c)
        c = actfn(c)
        c = nn.Dense(c_dim, dtype=self.dtype, name="process_c_1")(c)
        c = actfn(c)

        # Encode inputs; concatenate encoded local conditioning channel-wise.
        h = nn.Conv(self.dim, (1, 1, 1), dtype=self.dtype, name="encode_x")(x)
        if c_local is not None:
            enc = nn.Conv(self.dim, (1, 1, 1), dtype=self.dtype, name="encode_c_local")(
                c_local
            )
            enc = jnp.broadcast_to(enc[None], (B, *enc.shape))
            h = jnp.concatenate([h, enc], axis=-1)

        h = UNet(
            dim=self.dim,
            levels=self.u_net_levels,
            actfn=actfn,
            norm_type=self.norm_type,
            attention_kind=self.attention_kind,
            remat=self.remat,
            dtype=self.dtype,
            name="u_net",
        )(h, c)

        h = ResnetBlock(self.dim, actfn, self.norm_type, self.dtype, name="decode_resnet")(
            h, c
        )
        out = nn.Conv(
            self.out_features, (1, 1, 1), dtype=jnp.float32, name="decode_out"
        )(h.astype(jnp.float32))
        return out
