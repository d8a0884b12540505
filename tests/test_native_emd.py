"""Cross-checks of the native C++ EMD solver against the scipy references.

Skipped when native/libemd.so has not been built (``make -C native``).
"""

import numpy as np
import pytest

from generative_turbulence_tpu.eval.emd import _native_lib, _transport_lp, emd2_uniform


pytestmark = pytest.mark.skipif(
    _native_lib() is None, reason="native/libemd.so not built"
)


def _native(M):
    import ctypes

    lib = _native_lib()
    M = np.ascontiguousarray(M, dtype=np.float64)
    return lib.emd_uniform(
        M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), *M.shape
    )


def test_native_matches_assignment_square():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(0)
    for n in (3, 17, 64):
        M = rng.uniform(size=(n, n))
        r, c = linear_sum_assignment(M)
        assert _native(M) == pytest.approx(M[r, c].sum() / n, abs=1e-9)


def test_native_matches_lp_rectangular():
    rng = np.random.default_rng(1)
    for shape in ((3, 8), (20, 7), (31, 45)):
        M = rng.uniform(size=shape)
        assert _native(M) == pytest.approx(_transport_lp(M), abs=1e-8)


def test_native_randomized():
    rng = np.random.default_rng(2)
    for _ in range(15):
        n, m = (int(x) for x in rng.integers(2, 40, size=2))
        M = rng.uniform(size=(n, m))
        assert _native(M) == pytest.approx(_transport_lp(M), abs=1e-8)


def test_native_rejects_nonfinite():
    M = np.array([[1.0, np.inf], [0.0, 1.0]])
    assert _native(M) < 0  # failure signal -> python falls back


def test_dispatch_uses_native_for_rectangular():
    rng = np.random.default_rng(3)
    M = rng.uniform(size=(9, 14))
    assert emd2_uniform(M) == pytest.approx(_transport_lp(M), abs=1e-8)
