"""Exact earth mover's distance with uniform marginals.

Replaces the reference's dependency on POT's C++ network simplex
(``ot.emd2([], [], M)``, ``turbdiff/models/metrics.py:475-537``).  Solver
selection:

1. Native C++ network simplex (``native/emd.cpp``) via ctypes when the shared
   library has been built — the production path.
2. Square cost matrices: the Jonker-Volgenant assignment solver
   (``scipy.optimize.linear_sum_assignment``) — exact, since uniform-marginal
   transport with n == m is totally unimodular and admits a permutation
   optimum (Birkhoff).
3. Rectangular: ``scipy.optimize.linprog`` (HiGHS) on the transportation LP.

All metric call sites in this framework produce square matrices (sample count
is matched to data count), so the scipy paths are exact everywhere.
"""

from __future__ import annotations

import ctypes
import functools
from pathlib import Path
from typing import Optional

import numpy as np


@functools.lru_cache(maxsize=1)
def _native_lib() -> Optional[ctypes.CDLL]:
    native_dir = Path(__file__).resolve().parents[2] / "native"
    lib_path = native_dir / "libemd.so"
    if not lib_path.is_file():
        # Self-build on first use (the .so is a build artifact, not committed).
        src = native_dir / "emd.cpp"
        if not src.is_file():
            return None
        import shutil
        import subprocess

        cxx = shutil.which("g++") or shutil.which("c++")
        if cxx is None:
            return None
        try:
            subprocess.run(
                [cxx, "-O3", "-std=c++17", "-fPIC", "-shared",
                 "-o", str(lib_path), str(src)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
        lib.emd_uniform.restype = ctypes.c_double
        lib.emd_uniform.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.c_int,
        ]
        return lib
    except OSError:
        return None


def emd2_uniform(M: np.ndarray, *, use_native: bool = True) -> float:
    """min <P, M> s.t. P 1 = 1/n, P^T 1 = 1/m, P >= 0 (exact optimum).

    Solver order: square matrices use the Jonker-Volgenant assignment solver
    (fastest; exact by Birkhoff); rectangular ones use the native C++
    min-cost-flow, falling back to the HiGHS transportation LP.
    """
    M = np.ascontiguousarray(M, dtype=np.float64)
    n, m = M.shape

    if n == m:
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(M)
        return float(M[rows, cols].sum() / n)

    if use_native:
        lib = _native_lib()
        if lib is not None:
            buf = M.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
            val = lib.emd_uniform(buf, n, m)
            if np.isfinite(val) and val >= 0:
                return float(val)
            # fall through to the LP on solver failure

    return _transport_lp(M)


def _transport_lp(M: np.ndarray) -> float:
    from scipy.optimize import linprog
    from scipy.sparse import coo_matrix

    n, m = M.shape
    a = np.full(n, 1.0 / n)
    b = np.full(m, 1.0 / m)

    # Row-sum and column-sum equality constraints over the flattened plan.
    row_idx = np.repeat(np.arange(n), m)
    col_idx = np.tile(np.arange(m), n)
    var_idx = np.arange(n * m)
    A = coo_matrix(
        (
            np.ones(2 * n * m),
            (
                np.concatenate([row_idx, n + col_idx]),
                np.concatenate([var_idx, var_idx]),
            ),
        ),
        shape=(n + m, n * m),
    )
    res = linprog(
        M.reshape(-1),
        A_eq=A,
        b_eq=np.concatenate([a, b]),
        bounds=(0, None),
        method="highs",
    )
    if not res.success:
        raise RuntimeError(f"transport LP failed: {res.message}")
    return float(res.fun)


def wasserstein2(D: np.ndarray, **kwargs) -> float:
    """2-Wasserstein from a pairwise-distance matrix: sqrt(EMD(D^2))."""
    return float(np.sqrt(emd2_uniform(np.asarray(D) ** 2, **kwargs)))
