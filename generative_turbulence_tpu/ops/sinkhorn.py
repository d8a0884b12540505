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
