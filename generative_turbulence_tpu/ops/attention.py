"""Attention primitives.

``multihead_attention`` computes softmax attention over flattened voxel
tokens.  On TPU the XLA lowering is already fused and MXU-bound at the
bottleneck token counts this framework uses (~200 tokens for the shapes grid);
a Pallas flash kernel is provided in ``pallas_kernels.py`` for large token
counts and is dispatched automatically above a threshold.

Equivalent role to ``turbdiff/models/attention.py:9-15`` (fused SDPA wrapper).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def multihead_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *, use_pallas: str = "auto"
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q, k, v: (B, H, N, D) -> (B, H, N, D)
    """
    n_tokens = q.shape[-2]
    if use_pallas == "always" or (use_pallas == "auto" and n_tokens >= 2048):
        from .pallas_kernels import flash_attention, pallas_available

        if pallas_available():
            return flash_attention(q, k, v)
    return _xla_attention(q, k, v)


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, precision=jax.lax.Precision.HIGHEST
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        "bhnm,bhmd->bhnd", weights, v, precision=jax.lax.Precision.HIGHEST
    )


def efficient_linear_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Linear attention (softmax over different axes; Zhuoran et al. style,
    mirroring ``turbdiff/models/ddpm.py:200-229``).

    q, k, v: (B, H, N, D) -> (B, H, N, D); cost O(N * D^2).
    """
    q = jax.nn.softmax(q, axis=-1)  # over feature dim
    k = jax.nn.softmax(k, axis=-2)  # over token dim
    context = jnp.einsum("bhnd,bhne->bhde", k, v)
    return jnp.einsum("bhnd,bhde->bhne", q, context)
