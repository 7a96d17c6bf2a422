"""ctypes bridge to the native C++ QP oracle (native/qp_oracle.cc).

Compiled on demand with g++ into the package build cache; no BLAS, no
pybind11 — plain C ABI + ctypes (this image has no pybind11).  Used by tests
to cross-certify the Python f64 oracle with a fully independent native
implementation (SURVEY.md §2.3: C++ host reference implementations as CPU
oracles).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native", "qp_oracle.cc")
_LOCK = threading.Lock()
_LIB = None


def _build_lib() -> str:
    cache = os.path.join(os.path.dirname(os.path.dirname(_HERE)), ".native_build")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libqp_oracle.so")
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", so],
            check=True,
            capture_output=True,
        )
    return so


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            d = ctypes.POINTER(ctypes.c_double)
            lib.qp_oracle_solve.restype = ctypes.c_int
            lib.qp_oracle_solve.argtypes = [
                ctypes.c_int, d, d, d,
                ctypes.c_double, ctypes.c_double,
                ctypes.c_int, ctypes.c_double, d, d,
            ]
            _LIB = lib
    return _LIB


def solve_qp(H, g, gait_table, mu=0.7, fz_max=500.0, max_iter=60, tol=1e-9):
    """Solve the masked condensed QP in native float64.

    Args mirror ``npref.solve_qp_kkt``: unmasked (12h,12h) H and (12h,) g in
    float64, the (4h,) stance table, cone mu and fz_max.  Returns
    ``(U, kkt)`` — the (12h,) solution (swing entries exactly 0 up to the
    identity pinning) and the (dual, primal, complementarity) residuals.
    """
    H = np.ascontiguousarray(H, np.float64)
    g = np.ascontiguousarray(g, np.float64)
    table = np.ascontiguousarray(gait_table, np.float64)
    n = g.shape[0]
    horizon = n // 12
    assert H.shape == (n, n) and table.shape == (4 * horizon,)
    U = np.zeros(n, np.float64)
    kkt = np.zeros(3, np.float64)
    d = ctypes.POINTER(ctypes.c_double)
    rc = _lib().qp_oracle_solve(
        horizon,
        H.ctypes.data_as(d), g.ctypes.data_as(d), table.ctypes.data_as(d),
        float(mu), float(fz_max), int(max_iter), float(tol),
        U.ctypes.data_as(d), kkt.ctypes.data_as(d),
    )
    if rc == 2:
        raise np.linalg.LinAlgError("native oracle: normal matrix not SPD")
    return U, kkt
