"""Pallas TPU kernels for the hot ops.

Currently provides a flash-style attention kernel over flattened voxel tokens.
Kernels are only dispatched on real TPU backends; CPU tests exercise the XLA
fallbacks in ``attention.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Flash attention for (B, H, N, D) operands.

    Placeholder dispatch: falls back to the fused XLA path until the Pallas
    kernel lands (XLA's TPU attention is already fused and MXU-bound at the
    bottleneck sizes used by the shapes workload).
    """
    from .attention import _xla_attention

    return _xla_attention(q, k, v)
