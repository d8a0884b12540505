"""Quadrature rules used by the turbulence statistics.

The reference integrates FFT shells with precomputed Lebedev grids (n=5810,
``turbdiff/models/metrics.py:282-294``).  We use a Gauss-Legendre (polar) x
uniform (azimuthal) product rule instead: it needs no coefficient tables, is
exact for spherical harmonics up to degree min(2*n_theta-1, n_phi-1), and at
the default resolution (54 x 108 = 5832 points) matches or exceeds the angular
resolution of Lebedev-5810 for the smooth shell integrands involved.
Weights are normalized to sum to 1, like the reference's.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
from scipy.special import roots_legendre


@functools.lru_cache(maxsize=None)
def gauss_legendre(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes/weights on [-1, 1] as float32 numpy arrays."""
    nodes, weights = roots_legendre(n)
    return nodes.astype(np.float32), weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def sphere_quadrature(n_points: int = 5832) -> Tuple[np.ndarray, np.ndarray]:
    """Unit-sphere quadrature with ~``n_points`` nodes.

    Returns (points (N, 3) float32, weights (N,) float32, weights sum to 1).
    Product rule: cos(theta) at Gauss-Legendre nodes, phi uniform.
    """
    n_theta = max(2, int(math.sqrt(n_points / 2)))
    n_phi = 2 * n_theta

    ct, wt = roots_legendre(n_theta)  # cos(theta) nodes on [-1, 1]
    st = np.sqrt(np.maximum(1.0 - ct**2, 0.0))
    phi = (np.arange(n_phi) + 0.5) * (2 * np.pi / n_phi)

    x = st[:, None] * np.cos(phi)[None, :]
    y = st[:, None] * np.sin(phi)[None, :]
    z = np.broadcast_to(ct[:, None], x.shape)

    points = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    weights = np.broadcast_to(wt[:, None] / (2.0 * n_phi), x.shape).reshape(-1)
    # wt sums to 2 over [-1,1]; dividing by 2*n_phi normalizes the total to 1.
    return points.astype(np.float32), weights.astype(np.float32)
