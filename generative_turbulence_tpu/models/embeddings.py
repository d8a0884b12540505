"""Timestep embeddings.

``NyquistFrequencyEmbedding`` reproduces the reference's default timestep
encoding (``turbdiff/models/ddpm.py:103-148``): k = dim/2 geometrically spaced
frequencies from 1/8 to Nyquist/(2*golden_ratio), each sampled as sin with a 0
and pi/2 phase shift (sin/cos pair).  The irrational top frequency keeps the
fastest-varying features unique across all T timesteps.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def nyquist_scale_bias(dim: int, timesteps: int):
    assert dim % 2 == 0
    k = dim // 2
    nyquist = timesteps / 2
    golden = (1 + np.sqrt(5)) / 2
    freqs = np.geomspace(1 / 8, nyquist / (2 * golden), num=k)
    scale = np.repeat(2 * np.pi * freqs / timesteps, 2).astype(np.float32)
    bias = np.tile(np.array([0.0, np.pi / 2], dtype=np.float32), k)
    return scale, bias


class NyquistFrequencyEmbedding(nn.Module):
    dim: int
    timesteps: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        scale, bias = nyquist_scale_bias(self.dim, self.timesteps)
        scale = jnp.asarray(scale)
        bias = jnp.asarray(bias)
        return jnp.sin(scale * t[..., None] + bias)


class SinusoidalTimeEmbedding(nn.Module):
    """Classic DDPM sin/cos embedding (``ddpm.py:88-100``)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(-np.log(10000.0) / (half - 1) * jnp.arange(half))
        args = t[..., None] * freqs
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
