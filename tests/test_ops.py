import numpy as np
import pytest

import jax
import jax.numpy as jnp

from generative_turbulence_tpu.ops import (
    centered_difference,
    curl,
    divergence,
    enstrophy,
    gauss_legendre,
    interp3,
    log_tke_distance_matrix,
    resize_trilinear,
    sphere_quadrature,
    tke_spectrum,
    vector_gradient,
    SpectrumOps,
)
from generative_turbulence_tpu.ops.spectra import spectrum_wavenumbers


def _grid(shape, h):
    axes = [np.arange(s) * h[i] for i, s in enumerate(shape)]
    return np.meshgrid(*axes, indexing="ij")


def test_stencils_analytic():
    shape = (12, 10, 8)
    h = np.array([0.5, 0.4, 0.3])
    X, Y, Z = _grid(shape, h)

    # u = (z^2, x^2, y^2): curl = (2y, 2z, 2x), divergence = 0 (exact for quadratics)
    u = np.stack([Z**2, X**2, Y**2], axis=-1)
    u = jnp.asarray(u[None])  # batch axis

    w = curl(u, h)
    assert w.shape == (1, 10, 8, 6, 3)
    Yi = Y[1:-1, 1:-1, 1:-1]
    Zi = Z[1:-1, 1:-1, 1:-1]
    Xi = X[1:-1, 1:-1, 1:-1]
    np.testing.assert_allclose(np.asarray(w[0, ..., 0]), 2 * Yi, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w[0, ..., 1]), 2 * Zi, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w[0, ..., 2]), 2 * Xi, rtol=1e-4, atol=1e-4)

    div = divergence(u, h)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-4)

    # divergence of (x^2, y^2, z^2) = 2(x+y+z)
    u2 = jnp.asarray(np.stack([X**2, Y**2, Z**2], axis=-1)[None])
    div2 = divergence(u2, h)
    np.testing.assert_allclose(
        np.asarray(div2[0, ..., 0]), 2 * (Xi + Yi + Zi), rtol=1e-4, atol=1e-4
    )

    grad = vector_gradient(u2, h)
    assert grad.shape == (1, 10, 8, 6, 3, 3)
    np.testing.assert_allclose(np.asarray(grad[0, ..., 0, 0]), 2 * Xi, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad[0, ..., 0, 1]), 0.0, atol=1e-5)

    ens = enstrophy(u, h)
    w_np = np.asarray(w)
    expect = (w_np**2).sum(-1, keepdims=True) * np.prod(h)
    np.testing.assert_allclose(np.asarray(ens), expect, rtol=1e-5)


def test_resize_trilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 13, 7, 5, 4)).astype(np.float32)

    for size in [(7, 4, 3), (3, 3, 3), (26, 14, 10), (13, 7, 5), (5, 9, 3)]:
        ours = np.asarray(resize_trilinear(jnp.asarray(x), size))
        # torch expects channels-first
        xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
        theirs = (
            F.interpolate(xt, size=size, mode="trilinear", align_corners=True)
            .permute(0, 2, 3, 4, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_interp3_exact_on_trilinear_function():
    # f(x,y,z) = 2x - 3y + z + 5 is reproduced exactly by trilinear interpolation
    shape = (8, 9, 7)
    X, Y, Z = _grid(shape, [1, 1, 1])
    grid = jnp.asarray(2 * X - 3 * Y + Z + 5)

    rng = np.random.default_rng(1)
    pts = rng.uniform([0, 0, 0], [7, 8, 6], size=(50, 3)).astype(np.float32)
    vals = interp3(grid, jnp.asarray(pts))
    expect = 2 * pts[:, 0] - 3 * pts[:, 1] + pts[:, 2] + 5
    np.testing.assert_allclose(np.asarray(vals), expect, rtol=1e-5, atol=1e-4)

    # clamping: out-of-range points do not produce NaN
    out = interp3(grid, jnp.asarray([[-1.0, 0.0, 0.0], [100.0, 8.0, 6.0]]))
    assert np.all(np.isfinite(np.asarray(out)))


def test_sphere_quadrature_moments():
    # Fibonacci lattice: not polynomially exact, but even/odd moments land
    # within ~1e-6 at n=5810 (limited by f32 node storage, not the rule).
    p, w = sphere_quadrature(5810)
    assert abs(w.sum() - 1.0) < 1e-5
    # <x^2> = <y^2> = <z^2> = 1/3 on the unit sphere
    for i in range(3):
        assert abs((w * p[:, i] ** 2).sum() - 1 / 3) < 1e-5
    # odd moments vanish
    for i in range(3):
        assert abs((w * p[:, i]).sum()) < 1e-5
    # degree-6 moment: int x^6 over sphere / 4pi = 1/7
    assert abs((w * p[:, 0] ** 6).sum() - 1 / 7) < 1e-5


def test_tke_spectrum_peak_at_mode():
    # A single Fourier mode in u' concentrates TKE-spectrum energy near its
    # wavenumber (TKE = 0.5 u'^2 has a DC and 2k component; the spherical
    # spectrum should peak around 2k for a pure mode, but definitely vary
    # smoothly and be positive).
    n = 32
    x = np.arange(n)
    kx = 4
    rng = np.random.default_rng(0)
    # small white-noise floor: a PURE mode has exact FFT zeros, which the
    # log-domain interpolation maps to -inf -> E=0 (same as the reference)
    u = rng.normal(size=(n, n, n, 3)).astype(np.float32) * 1e-3
    u[..., 0] += np.sin(2 * np.pi * kx * x / n)[:, None, None]

    ops = SpectrumOps.create(n_sphere=1152, n_legendre=16)
    k = jnp.asarray(np.linspace(1.0, 14.0, 14, dtype=np.float32))
    E = np.asarray(tke_spectrum(jnp.asarray(u), k, ops))
    assert E.shape == (14,)
    assert np.all(E >= 0)
    # The noise floor grows ~ 4*pi*k^2; the mode should stick out of it as a
    # local bump at k = 2*kx relative to its immediate neighbors.
    peak_idx = int(np.argmin(np.abs(np.asarray(k) - 2 * kx)))
    assert E[peak_idx] > 1.5 * E[peak_idx - 1]
    assert E[peak_idx] > 1.5 * E[peak_idx + 1]


def test_log_tke_distance_matrix():
    rng = np.random.default_rng(0)
    shape = (16, 16, 16)
    u_a = rng.normal(size=(3, *shape, 3)).astype(np.float32)
    u_b = np.concatenate([u_a[:2], rng.normal(size=(2, *shape, 3)).astype(np.float32)])
    u_mean = np.zeros((*shape, 3), dtype=np.float32)

    ops = SpectrumOps.create(n_sphere=512, n_legendre=16)
    D, log_a, log_b, k = jax.jit(
        lambda a, b, m: log_tke_distance_matrix(a, b, m, ops)
    )(jnp.asarray(u_a), jnp.asarray(u_b), jnp.asarray(u_mean))

    D = np.asarray(D)
    assert D.shape == (3, 4)
    # identical fields have ~zero distance
    assert D[0, 0] < 1e-3 and D[1, 1] < 1e-3
    # distinct fields have larger distance
    assert D[0, 2] > D[0, 0]
    assert np.all(np.isfinite(np.asarray(log_a)))
    k = np.asarray(k)
    assert k.min() >= 1.0 and k.max() <= (16 - 1) // 2 + 1e-6


def test_spectrum_wavenumber_range():
    ops = SpectrumOps.create(n_sphere=128, n_legendre=8)
    k = np.asarray(spectrum_wavenumbers((50, 50, 194), ops))
    assert k.min() > 1.0 - 1e-5
    assert k.max() < (50 - 1) // 2 + 1e-5


def test_gauss_legendre_integrates_polynomials():
    nodes, weights = gauss_legendre(8)
    # integral of x^4 over [-1, 1] = 2/5
    assert abs((weights * nodes**4).sum() - 2 / 5) < 1e-6
