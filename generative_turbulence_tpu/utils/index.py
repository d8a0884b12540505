"""Flat <-> multi-dimensional index conversions.

Mirrors the semantics of numpy's ``ravel_multi_index``/``unravel_index`` but is
written against a generic array namespace so the same helpers work on host
numpy arrays (where geometry preprocessing happens) and on jax arrays inside
jitted code.  Equivalent role to ``turbdiff/utils/index.py:8-37`` in the
reference.
"""

from __future__ import annotations

import numpy as np


def ravel_multi_index(coords, shape) -> np.ndarray:
    """Convert (..., ndim) integer coordinates into flat indices for ``shape``."""
    coords = np.asarray(coords) if isinstance(coords, (list, tuple)) else coords
    xp = np if isinstance(coords, np.ndarray) else _jnp()
    strides = _strides(shape)
    strides = xp.asarray(strides, dtype=coords.dtype)
    return (coords * strides).sum(axis=-1)


def unravel_index(flat, shape):
    """Convert flat indices into (..., ndim) coordinates for ``shape``."""
    flat = np.asarray(flat) if isinstance(flat, (list, tuple)) else flat
    xp = np if isinstance(flat, np.ndarray) else _jnp()
    strides = _strides(shape)
    coords = []
    for stride, size in zip(strides, shape):
        coords.append((flat // stride) % size)
    return xp.stack(coords, axis=-1)


def _strides(shape) -> np.ndarray:
    shape = np.asarray(shape, dtype=np.int64)
    strides = np.ones_like(shape)
    strides[:-1] = np.cumprod(shape[::-1])[::-1][1:]
    return strides


def _jnp():
    import jax.numpy as jnp

    return jnp
