"""Pallas TPU kernels for the hot ops.

- ``flash_attention``: blockwise attention with online softmax over flattened
  voxel tokens (replaces the reference's fused SDPA CUDA kernels,
  ``turbdiff/models/attention.py:9-15``).  Used automatically above a token
  threshold; the U-Net bottleneck (~200 tokens) stays on the fused XLA path.
- ``conv3d_3x3`` / ``fused_double_conv_block``: the ResnetBlock conv path
  as MXU matmul kernels (reference ``ddpm.py:154-197``).  Both ship OPT-IN
  with recorded end-to-end measurements showing XLA's in-context conv
  fusion is currently the bar at this workload (see the status notes below).

All kernels run in interpret mode on CPU for tests.
"""

from __future__ import annotations

import functools
import os
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
# 3x3x3 convolution (replicate padding) as blocked MXU matmuls
# ---------------------------------------------------------------------------
#
# XLA's TPU conv emitter handles the full-resolution U-Net levels poorly at
# this workload (profiled: "EmitAllBatchInSublanes", 4x5x3 output windows,
# ~30% MXU on the 194x50x50 grid).  This kernel recasts the conv as dense
# matmuls: one program per (batch, output x-plane) builds a z-im2col patch
# matrix in VMEM — rows = (y, z) positions, columns = 3*C_in channels of the
# three z-shifted input slabs — and accumulates nine (i, j)-shifted matmuls
# against a (3*C_in, C_out) weight slice.  The contraction is dense (no
# zero-padding inside K), so the MXU runs at full occupancy; operands are
# bf16 with f32 accumulation, which matches XLA's default-precision conv
# numerics on TPU.  Role parity: the cuDNN conv3d kernels the reference
# leans on implicitly (SURVEY §2.9).


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _conv3x3_kernel(x_ref, w_ref, b_ref, o_ref, s1_ref, s2_ref, *, z_len: int):
    """One (batch, output x-plane, kernel x-offset i) program.

    The host has already built the z-im2col: x_ref is padded input x-plane
    ``ix + i`` flattened to (1, 1, (Y+2)*z_len, 3C) with row index
    y*z_len + z, so every j contribution is a contiguous, tile-aligned row
    slice — three pure (Y*z_len, 3C) x (3C, F) matmuls.  The output block is
    revisited across the (sequential, innermost) i dimension and serves as
    the f32 accumulator, keeping a single input plane live in VMEM.

    w_ref: (1, 3, 3C, F) — the i-th weight slab; b_ref: (1, F);
    o_ref: (1, 1, Y*z_len, F) f32.
    """
    n_rows, n_f = o_ref.shape[-2], o_ref.shape[-1]
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        o_ref[0, 0] = jnp.broadcast_to(b_ref[0], (n_rows, n_f))

    c_in = x_ref.shape[-1]
    n_plane_rows = s1_ref.shape[0]

    # Both the y-shift (j) and z-shift (k) are plain row offsets of the
    # flattened (y*z_len + z) layout.  The k=1,2 shifts bounce through VMEM
    # scratch ONCE per plane to canonicalize their sublane offsets (Mosaic
    # cannot concat mismatched offsets); the j-shifts are z_len-row offsets,
    # which stay tile-aligned, so the per-j patch is a free lane-concat of
    # three aligned slices — a dense (n_rows, 3C) block feeding the MXU at
    # K = 3C with no zero padding.
    s1_ref[:] = x_ref[0, 0, 1 : 1 + n_plane_rows, :]
    s2_ref[:] = x_ref[0, 0, 2 : 2 + n_plane_rows, :]

    acc = o_ref[0, 0]
    for j in range(3):
        start = j * z_len
        patches = jnp.concatenate(
            [
                x_ref[0, 0, start : start + n_rows, :],
                s1_ref[start : start + n_rows, :],
                s2_ref[start : start + n_rows, :],
            ],
            axis=-1,
        )
        acc += jnp.dot(
            patches,
            w_ref[0, j].reshape(3 * c_in, n_f),
            preferred_element_type=jnp.float32,
        )
    o_ref[0, 0] = acc


def _pad_flatten_kernel(x_ref, o_ref, *, z_len: int):
    """Build one replicate-padded, row-flattened input plane.

    x_ref: (1, 1, Y, Z, C) raw plane (x-edge replication happens in the
    index map); o_ref: (1, 1, (Y+2)*z_len + 16, C) with row = y'*z_len + z',
    where y'/z' are the padded coordinates.  All concat pieces are canonical
    (offset-0): the z-edge row is produced by an f32 pltpu.roll instead of a
    misaligned sublane slice.
    """
    v = x_ref[0, 0]  # (Y, Z, C)
    Y, Z, C = v.shape
    dtype = o_ref.dtype

    # rolled[:, 0] = v[:, Z-1] — the far z edge, at canonical offset.
    rolled = pltpu.roll(v.astype(jnp.float32), shift=1, axis=1).astype(dtype)
    pieces = [v[:, :1].astype(dtype), v.astype(dtype), rolled[:, :1]]
    fill = z_len - Z - 2
    if fill:
        pieces.append(jnp.zeros((Y, fill, C), dtype))
    vp = jnp.concatenate(pieces, axis=1)  # (Y, z_len, C), z' = z + 1
    full = jnp.concatenate([vp[:1], vp, vp[-1:]], axis=0)  # y' = y + 1
    o_ref[0, 0, : (Y + 2) * z_len, :] = full.reshape((Y + 2) * z_len, C)
    o_ref[0, 0, (Y + 2) * z_len :, :] = jnp.zeros((16, C), dtype)


def _pad_flatten(x: jnp.ndarray, z_len: int, dtype) -> jnp.ndarray:
    """(B, X, Y, Z, C) -> (B, X+2, (Y+2)*z_len + 16, C) padded flat planes."""
    B, X, Y, Z, C = x.shape
    rows = (Y + 2) * z_len + 16
    return pl.pallas_call(
        functools.partial(_pad_flatten_kernel, z_len=z_len),
        out_shape=jax.ShapeDtypeStruct((B, X + 2, rows, C), dtype),
        grid=(B, X + 2),
        in_specs=[
            pl.BlockSpec(
                (1, 1, Y, Z, C),
                lambda bb, xi: (bb, jnp.clip(xi - 1, 0, X - 1), 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, C), lambda bb, xi: (bb, xi, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x)


def _conv3d_3x3_pallas_raw(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """x: (B, X, Y, Z, C) unpadded; w: (3, 3, 3, C, F); b: (F,).

    Returns the replicate-padded SAME conv, (B, X, Y, Z, F) in x.dtype.
    """
    B, X, Y, Z, C = x.shape
    F = w.shape[-1]
    compute_dtype = jnp.bfloat16

    # Rows per y (z_len >= Z + 2 so every z-shifted slice stays in-plane,
    # 16-sublane aligned to keep bf16 row slices tile-friendly).
    z_len = _round_up(Z + 2, 16)

    # Replicate-pad by 1, zero-fill z to z_len, flatten rows to y*z_len + z —
    # all inside a Pallas prep kernel (XLA's pads cost ~20x speed-of-light on
    # this layout).  No im2col anywhere — the conv kernel folds all shifts
    # into row offsets.
    xflat = _pad_flatten(x, z_len, compute_dtype)

    w2 = w.astype(compute_dtype)  # (3, 3, 3, C, F)
    b2 = b.reshape(1, F).astype(jnp.float32)

    rows = (Y + 2) * z_len + 16
    n_out_rows = Y * z_len
    grid = (B, X, 3)
    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, z_len=z_len),
        out_shape=jax.ShapeDtypeStruct((B, X, n_out_rows, F), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rows, C), lambda bb, ix, i: (bb, ix + i, 0, 0)),
            pl.BlockSpec((1, 3, 3, C, F), lambda bb, ix, i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, F), lambda bb, ix, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n_out_rows, F), lambda bb, ix, i: (bb, ix, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM(((Y + 2) * z_len, C), compute_dtype),
            pltpu.VMEM(((Y + 2) * z_len, C), compute_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xflat, w2, b2)
    out = out.astype(x.dtype)
    return out.reshape(B, X, Y, z_len, F)[:, :, :, :Z, :]


def _conv3d_3x3_xla(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """XLA reference path (for the VJP and for CPU/fallback)."""
    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xe,
        w,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + b


@jax.custom_vjp
def conv3d_3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Replicate-padded SAME 3x3x3 conv via the Pallas matmul kernel.

    Forward runs the Pallas kernel (bf16 operands, f32 accumulation — XLA
    default-precision conv numerics); the backward pass reuses XLA's conv
    gradients, so training works everywhere the XLA path does.
    """
    return _conv3d_3x3_pallas_raw(x, w, b)


def _conv3d_3x3_fwd(x, w, b):
    return conv3d_3x3(x, w, b), (x, w)


def _conv3d_3x3_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _conv3d_3x3_xla(x_, w_, b_), x, w, jnp.zeros((w.shape[-1],), x.dtype))
    return vjp(g)


conv3d_3x3.defvjp(_conv3d_3x3_fwd, _conv3d_3x3_bwd)


# Status (measured on TPU v5e, 8x194x50x50x64 -> 64, 2026-08-16): the Pallas
# conv kernel alone is faster than XLA's conv emitter on-device (17.7 ms
# kernel + 5.3 ms pad-prep vs ~23 ms fusion + ~10 ms conv+GN overhead in the
# full model), but engaging it per-ConvBlock LOSES end-to-end (f32 fwd 287 ->
# 348 ms; bf16 226 -> 300 ms): each call pays layout prep/copies and XLA
# loses its conv+GN fusions.  ``conv3d_3x3`` therefore stays a measured,
# tested experiment with NO model-graph dispatch; the production-relevant
# descendant is the fused ConvBlock chain (``fused_double_conv_block``)
# below, which keeps activations in the padded-flat layout across a whole
# conv + GroupNorm + FiLM + SiLU chain (opt-in GT_FUSED_BLOCKS=1).


# ---------------------------------------------------------------------------
# Fused ResnetBlock core: conv -> GN -> FiLM -> SiLU -> conv -> GN -> SiLU
# with activations held in the padded-flat layout between the convs
# ---------------------------------------------------------------------------
#
# The per-ConvBlock Pallas conv loses end-to-end because every call pays
# layout prep and XLA loses its conv+GN fusions (see the status note above).
# This chain removes both costs: ``_pad_flatten`` runs ONCE per block, the
# conv kernel emits masked per-plane channel moments alongside its bf16
# flat output, a tiny XLA pass folds GroupNorm + FiLM into per-(B, F) affine
# vectors, and ``_affine_silu_repad`` applies silu(a*x + b) WHILE writing the
# next conv's padded-flat input — so level-0 activations never round-trip
# through the standard layout between the two convs.  Role parity: the cuDNN
# conv3d + GroupNorm modules of the reference ResnetBlock (ddpm.py:154-197).


def _conv3x3_stats_kernel(
    x_ref, w_ref, b_ref, o_ref, st_ref, acc_ref, s1_ref, s2_ref, *, z_len: int, n_z: int
):
    """Like ``_conv3x3_kernel`` but accumulates in f32 VMEM scratch, stores a
    bf16 flat plane, and emits masked per-plane channel moments.

    o_ref: (1, 1, Y*z_len, F) compute dtype; st_ref: (1, 1, 8, F) f32 with
    row 0 = sum over valid rows, row 1 = sum of squares.
    """
    n_rows, n_f = o_ref.shape[-2], o_ref.shape[-1]
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.broadcast_to(b_ref[0], (n_rows, n_f))

    c_in = x_ref.shape[-1]
    n_plane_rows = s1_ref.shape[0]
    s1_ref[:] = x_ref[0, 0, 1 : 1 + n_plane_rows, :]
    s2_ref[:] = x_ref[0, 0, 2 : 2 + n_plane_rows, :]

    acc = acc_ref[:]
    for j in range(3):
        start = j * z_len
        patches = jnp.concatenate(
            [
                x_ref[0, 0, start : start + n_rows, :],
                s1_ref[start : start + n_rows, :],
                s2_ref[start : start + n_rows, :],
            ],
            axis=-1,
        )
        acc += jnp.dot(
            patches,
            w_ref[0, j].reshape(3 * c_in, n_f),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc

    @pl.when(i == 2)
    def _finish():
        out = acc_ref[:]
        o_ref[0, 0] = out.astype(o_ref.dtype)
        # Mask the z >= Z garbage rows (row = y*z_len + z) out of the moments.
        row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
        valid = (row % z_len) < n_z
        masked = jnp.where(valid, out, 0.0)
        # Build the (8, F) stats tile by concat (Mosaic has no scatter).
        s0 = jnp.sum(masked, axis=0, keepdims=True)
        s1 = jnp.sum(masked * out, axis=0, keepdims=True)
        st_ref[0, 0] = jnp.concatenate(
            [s0, s1, jnp.zeros((6, n_f), jnp.float32)], axis=0
        )


def _conv3x3_flat(
    xflat: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    spatial: Tuple[int, int, int],
    z_len: int,
    compute_dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conv over padded-flat input planes -> (flat output, per-plane moments).

    xflat: (B, X+2, (Y+2)*z_len + 16, C); returns ((B, X, Y*z_len, F) in
    ``compute_dtype``, (B, X, 8, F) f32).
    """
    B = xflat.shape[0]
    X, Y, Z = spatial
    C = xflat.shape[-1]
    F = w.shape[-1]
    rows = (Y + 2) * z_len + 16
    n_out_rows = Y * z_len

    w2 = w.astype(compute_dtype)
    b2 = b.reshape(1, F).astype(jnp.float32)

    out, stats = pl.pallas_call(
        functools.partial(_conv3x3_stats_kernel, z_len=z_len, n_z=Z),
        out_shape=(
            jax.ShapeDtypeStruct((B, X, n_out_rows, F), compute_dtype),
            jax.ShapeDtypeStruct((B, X, 8, F), jnp.float32),
        ),
        grid=(B, X, 3),
        in_specs=[
            pl.BlockSpec((1, 1, rows, C), lambda bb, ix, i: (bb, ix + i, 0, 0)),
            pl.BlockSpec((1, 3, 3, C, F), lambda bb, ix, i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, F), lambda bb, ix, i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, n_out_rows, F), lambda bb, ix, i: (bb, ix, 0, 0)),
            pl.BlockSpec((1, 1, 8, F), lambda bb, ix, i: (bb, ix, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_out_rows, F), jnp.float32),
            pltpu.VMEM(((Y + 2) * z_len, C), compute_dtype),
            pltpu.VMEM(((Y + 2) * z_len, C), compute_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(xflat, w2, b2)
    return out, stats


def _gn_affine(stats, gamma, beta, scale, shift, *, count, num_groups, eps):
    """Fold GroupNorm + FiLM into per-(B, F) affine vectors a, b so the apply
    kernel is a single silu(a*x + b): a = inv*gamma*(scale+1),
    b = (beta - mean*inv*gamma)*(scale+1) + shift."""
    B, _, _, F = stats.shape
    G = num_groups
    Cg = F // G
    s = stats[:, :, 0, :].sum(axis=1)  # (B, F)
    ss = stats[:, :, 1, :].sum(axis=1)
    sg = s.reshape(B, G, Cg).sum(-1, keepdims=True)  # (B, G, 1)
    ssg = ss.reshape(B, G, Cg).sum(-1, keepdims=True)
    n = count * Cg
    mean = sg / n
    # E[x^2] - E[x]^2 in f32 can go (more than eps) negative by catastrophic
    # cancellation on large-mean/near-constant groups; clamp before rsqrt.
    var = jnp.maximum(ssg / n - mean**2, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.broadcast_to(mean, (B, G, Cg)).reshape(B, F)
    inv_c = jnp.broadcast_to(inv, (B, G, Cg)).reshape(B, F)
    gamma = gamma.astype(jnp.float32)[None]
    beta = beta.astype(jnp.float32)[None]
    if scale is None:
        film_scale = jnp.ones((B, F), jnp.float32)
        film_shift = jnp.zeros((B, F), jnp.float32)
    else:
        film_scale = scale.astype(jnp.float32) + 1.0
        film_shift = shift.astype(jnp.float32)
    a = inv_c * gamma * film_scale
    b = (beta - mean_c * inv_c * gamma) * film_scale + film_shift
    return a, b


def _affine_silu_repad_kernel(x_ref, a_ref, b_ref, o_ref, *, z_len: int, n_z: int):
    """silu(a*x + b) on one flat plane, written as the next conv's
    padded-flat input plane (same construction as ``_pad_flatten_kernel``)."""
    n_rows, F = x_ref.shape[-2], x_ref.shape[-1]
    Y = n_rows // z_len
    y = x_ref[0, 0].astype(jnp.float32) * a_ref[0] + b_ref[0]
    act32 = (y * jax.nn.sigmoid(y)).reshape(Y, z_len, F)
    v = act32.astype(o_ref.dtype)
    # Bring the real z-edge column (z = n_z - 1) to offset 0 for the concat.
    # Roll in f32: Mosaic's rotate only supports 32-bit element types.
    rolled = pltpu.roll(act32, shift=z_len - n_z + 1, axis=1).astype(o_ref.dtype)
    pieces = [v[:, :1], v[:, :n_z], rolled[:, :1]]
    fill = z_len - n_z - 2
    if fill:
        pieces.append(jnp.zeros((Y, fill, F), o_ref.dtype))
    vp = jnp.concatenate(pieces, axis=1)  # (Y, z_len, F)
    full = jnp.concatenate([vp[:1], vp, vp[-1:]], axis=0)  # (Y+2, z_len, F)
    o_ref[0, 0, : (Y + 2) * z_len, :] = full.reshape((Y + 2) * z_len, F)
    o_ref[0, 0, (Y + 2) * z_len :, :] = jnp.zeros((16, F), o_ref.dtype)


def _affine_silu_std_kernel(x_ref, a_ref, b_ref, o_ref, *, z_len: int):
    """silu(a*x + b) on one flat plane, written in standard (Y, Z, F) layout."""
    n_rows, F = x_ref.shape[-2], x_ref.shape[-1]
    Y = n_rows // z_len
    Z = o_ref.shape[-2]
    y = x_ref[0, 0].astype(jnp.float32) * a_ref[0] + b_ref[0]
    act = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)
    o_ref[0, 0] = act.reshape(Y, z_len, F)[:, :Z, :]


def _affine_silu_repad(x, a, b, *, spatial, z_len, dtype):
    B = x.shape[0]
    X, Y, Z = spatial
    F = x.shape[-1]
    rows = (Y + 2) * z_len + 16
    a3 = a[:, None, :].astype(jnp.float32)
    b3 = b[:, None, :].astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_affine_silu_repad_kernel, z_len=z_len, n_z=Z),
        out_shape=jax.ShapeDtypeStruct((B, X + 2, rows, F), dtype),
        grid=(B, X + 2),
        in_specs=[
            pl.BlockSpec(
                (1, 1, Y * z_len, F),
                lambda bb, xi: (bb, jnp.clip(xi - 1, 0, X - 1), 0, 0),
            ),
            pl.BlockSpec((1, 1, F), lambda bb, xi: (bb, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda bb, xi: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, F), lambda bb, xi: (bb, xi, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(x, a3, b3)


def _affine_silu_std(x, a, b, *, spatial, z_len, dtype):
    B = x.shape[0]
    X, Y, Z = spatial
    F = x.shape[-1]
    a3 = a[:, None, :].astype(jnp.float32)
    b3 = b[:, None, :].astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_affine_silu_std_kernel, z_len=z_len),
        out_shape=jax.ShapeDtypeStruct((B, X, Y, Z, F), dtype),
        grid=(B, X),
        in_specs=[
            pl.BlockSpec((1, 1, Y * z_len, F), lambda bb, xi: (bb, xi, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda bb, xi: (bb, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda bb, xi: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Y, Z, F), lambda bb, xi: (bb, xi, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(x, a3, b3)


def _reference_double_conv(
    x, w1, b1, gamma1, beta1, scale, shift, w2, b2, gamma2, beta2, *, num_groups, eps
):
    """XLA reference of the fused chain (used for the VJP and CPU fallback)."""

    def conv_gn_silu(h, w, b, gamma, beta, sc, sh):
        y = _conv3d_3x3_xla(h, w, b)
        B, X, Y, Z, F = y.shape
        G = num_groups
        yg = y.astype(jnp.float32).reshape(B, X, Y, Z, G, F // G)
        mean = yg.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = yg.var(axis=(1, 2, 3, 5), keepdims=True)
        yn = ((yg - mean) * jax.lax.rsqrt(var + eps)).reshape(B, X, Y, Z, F)
        yn = yn * gamma + beta
        if sc is not None:
            yn = (sc[:, None, None, None, :] + 1.0) * yn + sh[:, None, None, None, :]
        return (yn * jax.nn.sigmoid(yn)).astype(x.dtype)

    h = conv_gn_silu(x, w1, b1, gamma1, beta1, scale, shift)
    return conv_gn_silu(h, w2, b2, gamma2, beta2, None, None)


def _fused_double_conv_fwd_impl(
    x, w1, b1, gamma1, beta1, scale, shift, w2, b2, gamma2, beta2, *, num_groups, eps
):
    B, X, Y, Z, C = x.shape
    F1 = w1.shape[-1]
    compute_dtype = jnp.bfloat16
    z_len = _round_up(Z + 2, 16)
    spatial = (X, Y, Z)
    count = X * Y * Z

    xflat = _pad_flatten(x, z_len, compute_dtype)
    h1, st1 = _conv3x3_flat(
        xflat, w1, b1, spatial=spatial, z_len=z_len, compute_dtype=compute_dtype
    )
    a1, bb1 = _gn_affine(
        st1, gamma1, beta1, scale, shift, count=count, num_groups=num_groups, eps=eps
    )
    h1p = _affine_silu_repad(
        h1, a1, bb1, spatial=spatial, z_len=z_len, dtype=compute_dtype
    )
    h2, st2 = _conv3x3_flat(
        h1p, w2, b2, spatial=spatial, z_len=z_len, compute_dtype=compute_dtype
    )
    a2, bb2 = _gn_affine(
        st2, gamma2, beta2, None, None, count=count, num_groups=num_groups, eps=eps
    )
    return _affine_silu_std(h2, a2, bb2, spatial=spatial, z_len=z_len, dtype=x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_double_conv_block(
    x, w1, b1, gamma1, beta1, scale, shift, w2, b2, gamma2, beta2,
    num_groups: int = 8, eps: float = 1e-5,
):
    """The ResnetBlock core (both ConvBlocks, without the residual) as a
    Pallas flat-layout chain: conv3x3 -> GroupNorm -> FiLM -> SiLU -> conv3x3
    -> GroupNorm -> SiLU.  bf16 conv operands with f32 accumulation/stats
    (XLA's default-precision TPU conv numerics).

    x: (B, X, Y, Z, C); w*: (3, 3, 3, C_in, F); gamma/beta: (F,);
    scale/shift: (B, F) FiLM vectors or None.  The backward pass runs the XLA
    reference chain, so training works everywhere.
    """
    return _fused_double_conv_fwd_impl(
        x, w1, b1, gamma1, beta1, scale, shift, w2, b2, gamma2, beta2,
        num_groups=num_groups, eps=eps,
    )


def _fused_double_conv_fwd(x, w1, b1, g1, be1, sc, sh, w2, b2, g2, be2, num_groups, eps):
    out = fused_double_conv_block(
        x, w1, b1, g1, be1, sc, sh, w2, b2, g2, be2, num_groups, eps
    )
    return out, (x, w1, b1, g1, be1, sc, sh, w2, b2, g2, be2)


def _fused_double_conv_bwd(num_groups, eps, res, g):
    x, w1, b1, g1, be1, sc, sh, w2, b2, g2, be2 = res
    diff = (x, w1, b1, g1, be1, sc, sh, w2, b2, g2, be2)
    _, vjp = jax.vjp(
        lambda *args: _reference_double_conv(*args, num_groups=num_groups, eps=eps),
        *diff,
    )
    return vjp(g)


fused_double_conv_block.defvjp(_fused_double_conv_fwd, _fused_double_conv_bwd)


# Status (measured on TPU v5e, 2026-08-16, batch 8 at the shapes grid):
# standalone at the down_0 shape the chain is ~6% faster than the unfused XLA
# reference (58.5 vs 62 ms device time after subtracting the ~28 ms axon
# dispatch overhead), but END-TO-END the bf16 model fwd REGRESSES with it
# (ddim50 40.4 -> 36.9 samples/min; f32 32.0 -> 30.4): inside the full graph
# XLA's conv emitter + op fusion already avoid the layout round-trips, while
# the chain pays ~28% z_len row padding, halo-plane duplication and separate
# pad/repad passes.  Ships OFF (opt-in GT_FUSED_BLOCKS=1) — the honest
# conclusion is that XLA's in-context conv path is the bar and these
# flat-layout kernels don't clear it at this workload.
FUSED_BLOCKS_ENABLED = os.environ.get("GT_FUSED_BLOCKS", "0") == "1"
MIN_SPATIAL_FOR_FUSED_BLOCK = 64 * 24 * 24
MAX_CHANNELS_FOR_FUSED_BLOCK = 160


def fused_block_applicable(x: jnp.ndarray, c_in: int, features: int) -> bool:
    """Envelope check for ``fused_double_conv_block`` (mirrors the conv
    dispatch: big grids, VMEM-bounded channel counts, TPU only)."""
    if not FUSED_BLOCKS_ENABLED or not pallas_available():
        return False
    B, X, Y, Z, _ = x.shape
    if X * Y * Z < MIN_SPATIAL_FOR_FUSED_BLOCK:
        return False
    return max(c_in, features) <= MAX_CHANNELS_FOR_FUSED_BLOCK
