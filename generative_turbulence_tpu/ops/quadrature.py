"""Quadrature rules used by the turbulence statistics.

The reference integrates FFT shells with precomputed Lebedev grids (n=5810,
``turbdiff/models/metrics.py:282-294``).  We use a Fibonacci-lattice sphere
rule instead: it needs no coefficient tables, its points are near-uniform on
the sphere (like Lebedev's), and on the actual integrand — trilinearly
interpolated log-power shells, which are only piecewise smooth, so
polynomial-exactness arguments don't apply — it matches the reference's
Lebedev-5810 spectra to <=1% max / ~0.2% mean at the same node count
(measured against the reference implementation; see
``tests/test_spectrum_parity.py``).  A Gauss-Legendre x uniform product rule
at the same budget was 3x worse (3.1% max) because it clusters points at the
poles.  Weights are equal and sum to 1, like the reference's.
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
def sphere_quadrature(n_points: int = 5810) -> Tuple[np.ndarray, np.ndarray]:
    """Unit-sphere quadrature with ``n_points`` nodes (default matches the
    reference's Lebedev-5810 budget).

    Returns (points (N, 3) float32, weights (N,) float32, weights sum to 1).
    Fibonacci (golden-angle) lattice: z descends uniformly while the azimuth
    advances by the golden angle, giving near-uniform area per node; even
    moments integrate to ~1e-8 absolute error at n=5810 (f64).
    """
    i = np.arange(n_points, dtype=np.float64) + 0.5
    phi = np.pi * (1.0 + math.sqrt(5.0)) * i
    z = 1.0 - 2.0 * i / n_points
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))

    points = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)
    weights = np.full(n_points, 1.0 / n_points)
    return points.astype(np.float32), weights.astype(np.float32)
