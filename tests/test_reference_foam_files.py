"""Parse the reference's REAL OpenFOAM-authored files (read-only).

Every other toolchain test reads files written by our own writers — a
circular check.  These tests exercise ``toolchain.foam_dicts`` /
``toolchain.foam_io`` against the genuine OpenFOAM 10 dicts shipped with the
reference's LES template (``/root/reference/scripts/les-template``), asserting
the exact field/BC values the reference's converter extracts from them
(``scripts/foam2h5.py:134-152``).
"""

from pathlib import Path

import numpy as np
import pytest

from generative_turbulence_tpu.toolchain.convert import read_nu
from generative_turbulence_tpu.toolchain.foam_dicts import (
    Field,
    parse_foam_file,
)
from generative_turbulence_tpu.toolchain.foam_io import read_boundary_conditions

TEMPLATE = Path("/root/reference/scripts/les-template")

pytestmark = pytest.mark.skipif(
    not TEMPLATE.is_dir(), reason="reference les-template not available"
)


def test_initial_conditions_u():
    d = parse_foam_file(TEMPLATE / "initial-conditions" / "U")
    assert d["dimensions"].exponents == (0, 1, -1, 0, 0, 0, 0)
    internal = d["internalField"]
    assert isinstance(internal, Field) and internal.uniform
    assert list(internal.value) == [0, 0, 0]

    bcs = read_boundary_conditions(TEMPLATE / "initial-conditions" / "U")
    assert set(bcs) == {"inlets", "outlets", "walls"}
    assert bcs["inlets"]["type"] == "fixed-value"
    np.testing.assert_allclose(bcs["inlets"]["value"], [10.0, 0.0, 0.0])
    assert bcs["outlets"]["type"] == "inlet-outlet"
    # noSlip normalizes to fixed-value zero (scripts/foam2h5.py:146-147)
    assert bcs["walls"]["type"] == "fixed-value"
    np.testing.assert_allclose(bcs["walls"]["value"], [0.0, 0.0, 0.0])


def test_initial_conditions_scalars():
    k = read_boundary_conditions(TEMPLATE / "initial-conditions" / "k")
    assert k["inlets"]["type"] == "fixed-value"
    np.testing.assert_allclose(k["inlets"]["value"], [2e-05])
    assert k["walls"]["type"] == "fixed-value"
    np.testing.assert_allclose(k["walls"]["value"], [0.0])
    assert k["outlets"]["type"] == "inlet-outlet"

    nut = read_boundary_conditions(TEMPLATE / "initial-conditions" / "nut")
    assert {b["type"] for b in nut.values()} == {"zero-gradient"}

    p = read_boundary_conditions(TEMPLATE / "initial-conditions" / "p")
    assert p["outlets"]["type"] == "fixed-value"
    np.testing.assert_allclose(p["outlets"]["value"], [0.0])
    assert p["inlets"]["type"] == "zero-gradient"
    assert p["walls"]["type"] == "zero-gradient"

    d = parse_foam_file(TEMPLATE / "initial-conditions" / "p")
    assert d["dimensions"].exponents == (0, 2, -2, 0, 0, 0, 0)


def test_physical_properties_nu():
    # read_nu resolves constant/physicalProperties relative to the case dir
    assert read_nu(TEMPLATE) == pytest.approx(1e-05)
    d = parse_foam_file(TEMPLATE / "constant" / "physicalProperties")
    assert str(d["viscosityModel"]) == "constant"
    assert d["nu"].exponents == (0, 2, -1, 0, 0, 0, 0)


def test_momentum_transport():
    d = parse_foam_file(TEMPLATE / "constant" / "momentumTransport")
    assert str(d["simulationType"]) == "LES"
    les = d["LES"]
    assert str(les["model"]) == "dynamicKEqn"
    assert str(les["turbulence"]) == "on"
    assert str(les["delta"]) == "cubeRootVol"
    assert str(les["dynamicKEqnCoeffs"]["filter"]) == "simple"
    assert les["cubeRootVolCoeffs"]["deltaCoeff"] == 1


def test_control_dict():
    d = parse_foam_file(TEMPLATE / "system" / "controlDict")
    assert str(d["application"]) == "pimpleFoam"
    assert d["endTime"] == pytest.approx(0.1)
    assert d["deltaT"] == pytest.approx(1e-05)
    assert d["writeInterval"] == pytest.approx(0.001)
    assert str(d["writeControl"]) == "adjustableRunTime"
    assert str(d["adjustTimeStep"]) == "yes"
    assert d["maxCo"] == pytest.approx(0.4)
    assert d["timePrecision"] == 5


def test_fv_schemes():
    d = parse_foam_file(TEMPLATE / "system" / "fvSchemes")
    assert str(d["ddtSchemes"]["default"]) == "backward"
    div = d["divSchemes"]
    assert str(div["default"]) == "none"
    # multi-token scheme values and function-call-like keys survive parsing
    assert "div(phi,U)" in div
    assert "LUST" in str(div["div(phi,U)"])
    assert "Gauss" in str(d["gradSchemes"]["default"])
    assert "corrected" in str(d["laplacianSchemes"]["default"])


def test_fv_solution_and_decompose():
    d = parse_foam_file(TEMPLATE / "system" / "fvSolution")
    assert "solvers" in d

    dp = parse_foam_file(TEMPLATE / "system" / "decomposeParDict")
    assert str(dp["method"]) == "scotch"
    assert dp["numberOfSubdomains"] == 4


def test_serializer_roundtrip_on_real_files():
    """Parsed reference dicts survive a serialize -> reparse round-trip."""
    from generative_turbulence_tpu.toolchain.foam_dicts import (
        parse_foam,
        serialize_foam,
    )

    for rel in [
        "initial-conditions/U",
        "initial-conditions/k",
        "system/controlDict",
        "constant/momentumTransport",
    ]:
        original = parse_foam_file(TEMPLATE / rel)
        reparsed = parse_foam(serialize_foam(original))
        assert reparsed == original, f"round-trip mismatch for {rel}"
