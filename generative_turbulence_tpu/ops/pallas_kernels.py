"""Pallas TPU kernels for the hot ops.

- ``flash_attention``: blockwise attention with online softmax over flattened
  voxel tokens (replaces the reference's fused SDPA CUDA kernels,
  ``turbdiff/models/attention.py:9-15``).  Used automatically above a token
  threshold; the U-Net bottleneck (~200 tokens) stays on the fused XLA path.
- ``groupnorm_film_silu``: fused GroupNorm + FiLM + SiLU for one HBM
  round-trip when a (batch, group) slab fits VMEM (the ResnetBlock hot path,
  reference ``ddpm.py:154-197``); falls back to the unfused path otherwise.

Both kernels run in interpret mode on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def _interpret() -> bool:
    return not pallas_available()


# ---------------------------------------------------------------------------
# Flash attention
# ---------------------------------------------------------------------------

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """One (batch*head, q-block) program: stream K/V blocks with online
    softmax.  Refs carry a leading block dim of 1:
    q_ref (1, BLOCK_Q, D_in); k_ref (1, N, D_in); v_ref (1, N, D);
    o_ref (1, BLOCK_Q, D)."""
    block_q = q_ref.shape[1]
    d_out = o_ref.shape[2]
    n = k_ref.shape[1]

    q = q_ref[0] * scale  # (BQ, D_in)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        # HIGHEST precision: full-f32 MXU passes to match the XLA reference
        # (default bf16 passes cost ~1e-3 absolute error).
        s = jnp.dot(
            q, k.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (BQ, BK)

        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p, v,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d_out), dtype=jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n // block_k, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Softmax attention for (B, H, N, D) operands via a Pallas kernel.

    N is padded to a block multiple with -inf-masked keys (handled by padding
    K rows so their scores underflow to zero weight).
    """
    B, H, N, D = q.shape
    scale = D**-0.5

    block_q = min(block_q, max(8, N))
    block_k = min(block_k, max(8, N))

    # Pad token axis to a common multiple of both blocks.
    mult = int(np.lcm(block_q, block_k))
    n_pad = (-N) % mult
    if n_pad:
        # Mask padded keys through an extra feature channel: real keys carry 0
        # there, padded keys -1e9, and every query carries 1/scale — so padded
        # key scores become -1e9 and their softmax weight underflows to zero.
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
        bias = jnp.zeros((B, H, N + n_pad, 1), q.dtype).at[:, :, N:, :].set(-1e9)
        k = jnp.concatenate([k, bias], axis=-1)
        q = jnp.concatenate([q, jnp.ones_like(q[..., :1]) / scale], axis=-1)
        D_in = D + 1
    else:
        D_in = D

    Np = N + n_pad
    qf = q.reshape(B * H, Np, D_in)
    kf = k.reshape(B * H, Np, D_in)
    vf = v.reshape(B * H, Np, D)

    grid = (B * H, Np // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D_in), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Np, D_in), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, Np, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0)),
        interpret=_interpret(),
    )(qf, kf, vf)

    out = out.reshape(B, H, Np, D)
    return out[:, :, :N, :]


# ---------------------------------------------------------------------------
# Fused GroupNorm + FiLM + SiLU
# ---------------------------------------------------------------------------

_VMEM_SLAB_LIMIT = 8 * 1024 * 1024  # bytes; conservative half of VMEM


def _gn_film_silu_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref, *, eps: float):
    """One (batch, group) slab: x_ref (S, Cg); affine/FiLM vectors (1, Cg)."""
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x)
    var = jnp.mean((x - mean) ** 2)
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv
    y = y * gamma_ref[:] + beta_ref[:]
    y = (scale_ref[:] + 1.0) * y + shift_ref[:]
    o_ref[:] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def groupnorm_film_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    shift: Optional[jnp.ndarray],
    *,
    num_groups: int = 8,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Fused GroupNorm(num_groups) + FiLM((scale+1)*y + shift) + SiLU.

    x: (B, X, Y, Z, C); gamma/beta: (C,); scale/shift: (B, C) or None.
    Falls back to the unfused jnp path when a slab exceeds the VMEM budget.
    """
    B, X, Y, Z, C = x.shape
    G = num_groups
    assert C % G == 0
    Cg = C // G
    S = X * Y * Z

    if scale is None:
        scale = jnp.zeros((B, C), x.dtype)
    if shift is None:
        shift = jnp.zeros((B, C), x.dtype)

    # VMEM footprint must account for TPU tiling: the lane (last) dimension
    # pads to 128, so a (S, Cg) slab with small Cg occupies S * 128 floats.
    # With in+out buffers and pipeline double-buffering, stay well under the
    # 16 MB VMEM budget or fall back to the XLA path (which fuses fine).
    padded_cg = max(Cg, 128)
    slab_bytes = S * padded_cg * 4 * 4  # in+out, double-buffered
    if slab_bytes > _VMEM_SLAB_LIMIT:
        return _unfused_gn_film_silu(x, gamma, beta, scale, shift, G, eps)

    xg = x.reshape(B, S, G, Cg).transpose(0, 2, 1, 3).reshape(B * G, S, Cg)
    gamma_g = gamma.reshape(G, 1, Cg)
    beta_g = beta.reshape(G, 1, Cg)
    gamma_bg = jnp.tile(gamma_g, (B, 1, 1))
    beta_bg = jnp.tile(beta_g, (B, 1, 1))
    scale_bg = scale.reshape(B, G, 1, Cg).reshape(B * G, 1, Cg)
    shift_bg = shift.reshape(B, G, 1, Cg).reshape(B * G, 1, Cg)

    out = pl.pallas_call(
        functools.partial(_gn_film_silu_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B * G, S, Cg), x.dtype),
        grid=(B * G,),
        in_specs=[
            pl.BlockSpec((1, S, Cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Cg), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Cg), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, Cg), lambda i: (i, 0, 0)),
        interpret=_interpret(),
    )(xg, gamma_bg, beta_bg, scale_bg, shift_bg)

    return out.reshape(B, G, S, Cg).transpose(0, 2, 1, 3).reshape(B, X, Y, Z, C)


def _unfused_gn_film_silu(x, gamma, beta, scale, shift, G, eps):
    B, X, Y, Z, C = x.shape
    xg = x.reshape(B, X, Y, Z, G, C // G).astype(jnp.float32)
    mean = xg.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = xg.var(axis=(1, 2, 3, 5), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(B, X, Y, Z, C)
    y = y * gamma + beta
    y = (scale[:, None, None, None, :] + 1.0) * y + shift[:, None, None, None, :]
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)
