"""Entropy-regularized optimal transport (Sinkhorn) — the on-device fast path
for Wasserstein metrics.

The exact EMD (``eval/emd.py``) runs on the host; this log-domain Sinkhorn is
pure jax and jit/vmap-able, so large batches of point-cloud comparisons can
stay on the TPU.  ``sinkhorn_emd2`` returns the plain entropic transport cost
``<P, M>`` (no debiasing term): it approaches the exact EMD from above as
reg -> 0, and at moderate regularization it overestimates — pick ``reg`` small
enough for the tolerance at hand, or use the exact host solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinkhorn_emd2(
    M: jnp.ndarray,
    *,
    reg: float = 0.05,
    n_iters: int = 200,
) -> jnp.ndarray:
    """<P, M> under entropic OT with uniform marginals (log-domain updates).

    M: (..., n, m) cost matrices (batched).  Returns (...) transport costs.
    """
    n, m = M.shape[-2], M.shape[-1]
    log_a = jnp.full(M.shape[:-1], -jnp.log(n), dtype=M.dtype)  # (..., n)
    log_b = jnp.full((*M.shape[:-2], m), -jnp.log(m), dtype=M.dtype)

    K = -M / reg  # log kernel

    def body(_, fg):
        f, g = fg
        # f_i = reg * (log a_i - logsumexp_j((g_j - M_ij)/reg))
        f = reg * (log_a - jax.scipy.special.logsumexp(K + g[..., None, :] / reg, axis=-1))
        g = reg * (log_b - jax.scipy.special.logsumexp(K + f[..., :, None] / reg, axis=-2))
        return f, g

    f0 = jnp.zeros_like(log_a)
    g0 = jnp.zeros_like(log_b)
    f, g = jax.lax.fori_loop(0, n_iters, body, (f0, g0))

    log_P = K + (f[..., :, None] + g[..., None, :]) / reg
    P = jnp.exp(log_P)
    return jnp.sum(P * M, axis=(-2, -1))


def sinkhorn_wasserstein2(D: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """sqrt(sinkhorn_emd2(D^2)): entropic 2-Wasserstein from distances."""
    return jnp.sqrt(sinkhorn_emd2(D**2, **kwargs))


def masked_sinkhorn_emd2(
    M: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    *,
    reg: float = 0.05,
    n_iters: int = 200,
) -> jnp.ndarray:
    """Entropic transport cost between the VALID subsets of padded clouds.

    M:         (..., n, m) cost matrices (entries at padded rows/cols are
               ignored; any finite value works)
    row_valid: (..., n) bool — True for real source points
    col_valid: (..., m) bool — True for real target points

    Uniform marginals over the valid points; padded points carry zero mass
    (log-domain -inf), so differently-sized point clouds can share ONE
    compiled program by padding to a bucket — the TPU-side answer to the
    reference's per-region host EMD streaming (metrics.py:503-530).
    """
    dtype = M.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype)
    n_a = jnp.sum(row_valid, axis=-1, keepdims=True).astype(dtype)
    n_b = jnp.sum(col_valid, axis=-1, keepdims=True).astype(dtype)
    log_a = jnp.where(row_valid, -jnp.log(jnp.maximum(n_a, 1.0)), neg_inf)
    log_b = jnp.where(col_valid, -jnp.log(jnp.maximum(n_b, 1.0)), neg_inf)

    # ``reg`` may be a scalar or a per-matrix (...) array (e.g. scaled to the
    # mean cost so convergence speed is scale-invariant).
    reg = jnp.asarray(reg, dtype)
    reg_r = reg[..., None] if reg.ndim else reg  # broadcast over rows/cols
    reg_rc = reg[..., None, None] if reg.ndim else reg

    # Padded entries get +inf cost in the kernel so their transport mass is
    # exactly zero even before the potentials converge.
    pair_valid = row_valid[..., :, None] & col_valid[..., None, :]
    K = jnp.where(pair_valid, -M / reg_rc, neg_inf)

    def body(_, fg):
        f, g = fg
        f = reg_r * (
            log_a
            - jax.scipy.special.logsumexp(K + g[..., None, :] / reg_rc, axis=-1)
        )
        f = jnp.where(row_valid, f, neg_inf)
        g = reg_r * (
            log_b
            - jax.scipy.special.logsumexp(K + f[..., :, None] / reg_rc, axis=-2)
        )
        g = jnp.where(col_valid, g, neg_inf)
        return f, g

    f0 = jnp.where(row_valid, 0.0, neg_inf).astype(dtype)
    g0 = jnp.where(col_valid, 0.0, neg_inf).astype(dtype)
    f, g = jax.lax.fori_loop(0, n_iters, body, (f0, g0))

    # The plan is a proper distribution, so log P <= 0 up to convergence
    # slack; clip to keep a not-yet-converged solve from overflowing exp.
    log_P = K + (f[..., :, None] + g[..., None, :]) / reg_rc
    P = jnp.where(pair_valid, jnp.exp(jnp.minimum(log_P, 30.0)), 0.0)
    # Renormalize the total mass (1 exactly at convergence).
    mass = jnp.maximum(jnp.sum(P, axis=(-2, -1), keepdims=True), 1e-30)
    P = P / mass
    return jnp.sum(P * jnp.where(pair_valid, M, 0.0), axis=(-2, -1))
