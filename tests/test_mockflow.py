"""Tests for the structured synthetic-turbulence mock solver.

The mock's whole purpose is geometry->statistics structure the evaluation
stack (TKE spectra, max-mean-TKE position, Wasserstein regions) can
discriminate — each property is asserted here at reduced resolution.
"""

import math

import numpy as np
import pytest

from generative_turbulence_tpu.toolchain.mockflow import MockFlowCase


def _case(holes, shape=(96, 24, 24), seed=1):
    inside = np.ones(shape, bool)
    holes = np.asarray(holes).reshape(-1, 2, 3)
    for lo, hi in holes:
        inside[lo[0] : hi[0], lo[1] : hi[1], lo[2] : hi[2]] = False
    return MockFlowCase(inside, holes, h=0.002, seed=seed)


@pytest.fixture(scope="module")
def fin_case():
    return _case([[[24, 8, 0], [30, 20, 24]]])


def test_mean_flow_mass_conserving(fin_case):
    flux = fin_case.u_mean[..., 0].sum(axis=(1, 2))
    assert flux.std() / flux.mean() < 1e-5
    # inlet plane carries the plug inflow
    np.testing.assert_allclose(fin_case.u_mean[0, :, :, 0], 20.0, rtol=5e-3)


def test_no_flow_in_obstacle(fin_case):
    assert np.all(fin_case.u_mean[~fin_case.inside] == 0.0)
    f = fin_case.frame(0)
    assert np.all(f["u"][~fin_case.inside] == 0.0)
    assert np.all(f["k"][~fin_case.inside] == 0.0)


def test_wake_tke_peaks_behind_obstacle(fin_case):
    # mean TKE proxy 1.5 q^2, profiled over x: the max must sit downstream of
    # the trailing face (x=30), within a few obstacle heights
    prof = (fin_case.q**2).sum(axis=(1, 2))
    peak = int(prof.argmax())
    assert 30 < peak < 90


def test_geometry_dependence():
    a = _case([[[24, 8, 0], [30, 20, 24]]])
    b = _case([[[48, 4, 4], [56, 20, 20]]])  # bigger body, further downstream
    pa = int((a.q**2).sum(axis=(1, 2)).argmax())
    pb = int((b.q**2).sum(axis=(1, 2)).argmax())
    assert pb > pa  # TKE maximum tracks the obstacle position
    # wake deficit: centerline velocity right behind each body is reduced
    assert a.u_mean[34, 14, 12, 0] < 0.8 * 20.0


def test_spectrum_von_karman_slope(fin_case):
    """Shell-averaged E(k) of the fluctuation noise follows the von Karman
    form: rising at k < k0, falling toward -5/3 in the inertial range."""
    g = fin_case._fresh_noise()[..., 0]
    nx, ny, nz = g.shape
    F = np.abs(np.fft.rfftn(g)) ** 2
    kx = np.fft.fftfreq(nx) * 2 * np.pi
    ky = np.fft.fftfreq(ny) * 2 * np.pi
    kz = np.fft.rfftfreq(nz) * 2 * np.pi
    k = np.sqrt(
        kx[:, None, None] ** 2 + ky[None, :, None] ** 2 + kz[None, None, :] ** 2
    )

    def ek(lo, hi):
        sel = (k >= lo) & (k < hi)
        return F[sel].mean() * ((lo + hi) / 2) ** 2

    # inertial range: log-slope between k=2.0 and 2.8 (k0 ~ 0.52)
    slope = math.log(ek(2.5, 3.1) / ek(1.7, 2.3)) / math.log(2.8 / 2.0)
    assert -2.2 < slope < -0.9
    # energy-containing range: spectrum must RISE below k0
    assert ek(0.15, 0.3) < ek(0.4, 0.7)


def test_temporal_ar1(fin_case):
    case = _case([[[24, 8, 0], [30, 20, 24]]], seed=7)
    m = case.inside
    a = case.frame(0)["u"] - case.u_mean
    b = case.frame(1)["u"] - case.u_mean
    r = (a[m] * b[m]).sum() / np.sqrt((a[m] ** 2).sum() * (b[m] ** 2).sum())
    assert 0.4 < r < 0.8  # temporal_rho = 0.6

    # two frames are different fields (not frozen turbulence)
    assert np.abs(a - b).max() > 0.1


def test_seed_determinism():
    a = _case([[[24, 8, 0], [30, 20, 24]]], seed=3).frame(0)["u"]
    b = _case([[[24, 8, 0], [30, 20, 24]]], seed=3).frame(0)["u"]
    np.testing.assert_array_equal(a, b)


def test_k_consistent_with_fluctuations(fin_case):
    """The k field's spatial mean tracks the local fluctuation energy."""
    f = fin_case.frame(0)
    m = fin_case.inside
    k_mean = f["k"][m].mean()
    expected = 1.5 * (fin_case.q[m] ** 2).mean()
    assert 0.5 * expected < k_mean < 2.0 * expected
    assert np.all(f["nut"][m] >= 0.0)
