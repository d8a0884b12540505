"""Turbulent-kinetic-energy spectra and spectrum distances, fully on-device.

Reproduces the estimator of the reference (``turbdiff/models/metrics.py:
270-378``): TKE field -> 3D FFT -> |.|^2 -> interpolate onto radius-k spheres
in the LOG domain (exponential decay is badly approximated linearly) ->
spherical quadrature -> scale by 4*pi*k^2; and the pairwise L2 distance between
log-spectra via Gauss-Legendre integration over k in [1, (min_dim-1)/2].

Everything is a pure jittable function of arrays.  ``SpectrumOps`` bundles the
quadrature constants so callers build them once per process.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .interp import interp3
from .quadrature import gauss_legendre, sphere_quadrature


def tke_field(u_perturbation: jnp.ndarray) -> jnp.ndarray:
    """Pointwise TKE 0.5 * sum_i u_i'^2 of (..., X, Y, Z, 3) -> (..., X, Y, Z)."""
    return 0.5 * (u_perturbation**2).sum(axis=-1)


@dataclasses.dataclass(frozen=True)
class SpectrumOps:
    """Quadrature constants for spectrum estimation + distance."""

    sphere_points: jnp.ndarray  # (P, 3)
    sphere_weights: jnp.ndarray  # (P,)
    legendre_nodes: jnp.ndarray  # (K,)
    legendre_weights: jnp.ndarray  # (K,)

    @staticmethod
    def create(n_sphere: int = 5810, n_legendre: int = 64) -> "SpectrumOps":
        p, w = sphere_quadrature(n_sphere)
        nodes, weights = gauss_legendre(n_legendre)
        return SpectrumOps(
            sphere_points=jnp.asarray(p),
            sphere_weights=jnp.asarray(w),
            legendre_nodes=jnp.asarray(nodes),
            legendre_weights=jnp.asarray(weights),
        )


def tke_spectrum(
    u_perturbation: jnp.ndarray, k: jnp.ndarray, ops: SpectrumOps
) -> jnp.ndarray:
    """Angle-integrated TKE spectrum E(k).

    u_perturbation: (..., X, Y, Z, 3) velocity fluctuations
    k:              (K,) wavenumbers (in FFT-bin units)
    Returns (..., K).
    """
    tke = tke_field(u_perturbation)

    tke_fft = jnp.fft.fftn(tke, axes=(-3, -2, -1))
    tke_fft = jnp.fft.fftshift(tke_fft, axes=(-3, -2, -1))
    power = jnp.abs(tke_fft) ** 2

    center = jnp.asarray(
        [s // 2 for s in tke.shape[-3:]], dtype=u_perturbation.dtype
    )
    # (K, P, 3) sphere points of radius k around the zero-frequency bin
    p_query = k[:, None, None] * ops.sphere_points[None, :, :] + center

    log_interp = interp3(jnp.log(power), p_query)  # (..., K, P)
    shell = jnp.exp(log_interp)
    # Exact f32 quadrature: metric parity requires full-precision reductions.
    E_k = jnp.einsum(
        "...kp,p->...k", shell, ops.sphere_weights, precision=jax.lax.Precision.HIGHEST
    )
    return E_k * (4 * jnp.pi * k**2)


def spectrum_wavenumbers(
    spatial_shape: Tuple[int, int, int], ops: SpectrumOps
) -> jnp.ndarray:
    """Gauss-Legendre k nodes mapped from [-1,1] to [1, (min_dim-1)//2]."""
    k_min = 1.0
    k_max = float((min(spatial_shape) - 1) // 2)
    slope = (k_max - k_min) / 2
    return slope * ops.legendre_nodes + (slope + k_min)


def log_tke_distance_matrix(
    u_a: jnp.ndarray,
    u_b: jnp.ndarray,
    u_mean: jnp.ndarray,
    ops: SpectrumOps,
):
    """Pairwise L2 distances between log-TKE spectra of two sample sets.

    u_a: (A, X, Y, Z, 3), u_b: (B, X, Y, Z, 3), u_mean: (X, Y, Z, 3) or
    broadcastable.  Returns (D (A, B), log_tke_a (A, K), log_tke_b (B, K),
    k (K,)).
    """
    assert u_a.shape[-1] == 3 and u_b.shape[-1] == 3 and u_mean.shape[-1] == 3
    assert u_a.shape[-4:-1] == u_b.shape[-4:-1] == u_mean.shape[-4:-1]

    spatial = u_a.shape[-4:-1]
    k = spectrum_wavenumbers(spatial, ops).astype(u_a.dtype)
    k_min, k_max = 1.0, float((min(spatial) - 1) // 2)
    slope = (k_max - k_min) / 2

    log_tke_a = jnp.log(tke_spectrum(u_a - u_mean, k, ops))
    log_tke_b = jnp.log(tke_spectrum(u_b - u_mean, k, ops))

    diff2 = (log_tke_a[:, None, :] - log_tke_b[None, :, :]) ** 2
    D = jnp.sqrt(
        slope
        * jnp.einsum(
            "abk,k->ab", diff2, ops.legendre_weights, precision=jax.lax.Precision.HIGHEST
        )
    )
    return D, log_tke_a, log_tke_b, k
