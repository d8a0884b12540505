"""Centered-difference differential operators on dense padded grids.

Layout is channels-last: fields are (..., X, Y, Z, C); the three spatial axes
are always the last three before the channel axis.  Derivative outputs are
shorter by 2 along every spatial axis (evaluated at interior cells only),
mirroring the semantics of ``turbdiff/metrics.py:9-95`` in the reference.

All functions are pure jax and jit/vmap/grad-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp

# Spatial axes, counted from the end (channel axis is -1).
_SPATIAL = (-4, -3, -2)


def _axis(dim: int) -> int:
    """Spatial dimension 0/1/2 -> negative array axis."""
    return _SPATIAL[dim]


def centered_difference(x: jnp.ndarray, *, dim: int, h: float) -> jnp.ndarray:
    """d/dx_dim via centered differences; shortens that axis by 2.

    ``x`` has NO channel axis here: (..., X, Y, Z).
    """
    axis = dim - 3  # x has only spatial axes at the end
    n = x.shape[axis]
    upper = jnp.take(x, jnp.arange(2, n), axis=axis)
    lower = jnp.take(x, jnp.arange(0, n - 2), axis=axis)
    return (upper - lower) / (2 * h)


def _trim(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Cut the first and last element along ``axis``."""
    n = x.shape[axis]
    return jnp.take(x, jnp.arange(1, n - 1), axis=axis)


def unpadded_derivative(x: jnp.ndarray, h, *, dim: int) -> jnp.ndarray:
    """Derivative along ``dim`` with padding trimmed on the other spatial axes.

    x: (..., X, Y, Z) -> (..., X-2, Y-2, Z-2)
    """
    for other in range(3):
        if other != dim:
            x = _trim(x, other - 3)
    return centered_difference(x, dim=dim, h=h[dim])


def divergence(u: jnp.ndarray, h) -> jnp.ndarray:
    """Divergence of u (..., X, Y, Z, 3) at interior cells -> (..., X-2, Y-2, Z-2, 1)."""
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    div = (
        unpadded_derivative(ux, h, dim=0)
        + unpadded_derivative(uy, h, dim=1)
        + unpadded_derivative(uz, h, dim=2)
    )
    return div[..., None]


def curl(u: jnp.ndarray, h) -> jnp.ndarray:
    """Curl of u (..., X, Y, Z, 3) at interior cells -> (..., X-2, Y-2, Z-2, 3)."""
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    ux_y = unpadded_derivative(ux, h, dim=1)
    ux_z = unpadded_derivative(ux, h, dim=2)
    uy_x = unpadded_derivative(uy, h, dim=0)
    uy_z = unpadded_derivative(uy, h, dim=2)
    uz_x = unpadded_derivative(uz, h, dim=0)
    uz_y = unpadded_derivative(uz, h, dim=1)
    return jnp.stack((uz_y - uy_z, ux_z - uz_x, uy_x - ux_y), axis=-1)


def vector_gradient(u: jnp.ndarray, h) -> jnp.ndarray:
    """Gradient of a vector field u (..., X, Y, Z, C).

    Returns (..., X-2, Y-2, Z-2, C, 3) where [..., i, j] = d u_i / d x_j.
    """
    C = u.shape[-1]
    rows = []
    for i in range(C):
        cols = [unpadded_derivative(u[..., i], h, dim=j) for j in range(3)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def enstrophy(u: jnp.ndarray, h) -> jnp.ndarray:
    """|curl u|^2 * cell volume at interior cells -> (..., X-2, Y-2, Z-2, 1)."""
    w = curl(u, h)
    dv = jnp.prod(jnp.asarray(h))
    return (w**2).sum(axis=-1, keepdims=True) * dv
