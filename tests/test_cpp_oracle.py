"""Cross-certification: native C++ f64 oracle vs the Python f64 oracle.

Two fully independent implementations (C++ from scratch incl. its own
Cholesky, numpy-based npref) of the same masked condensed QP agreeing to
~1e-7 on KKT-certified optima closes the "oracle validates the oracle" hole
from the native side (SURVEY.md §2.3).
"""
import numpy as np
import pytest

from pympc_quadruped_tpu.oracle import cpp, npref

from test_qp import _mpc_instance


@pytest.mark.parametrize("tick", [0, 100, 340, 660])
def test_cpp_oracle_matches_python_oracle(tick):
    mpc, robot, H64, g64, table = _mpc_instance(tick)
    U_py, kkt_py = npref.solve_qp_kkt(H64, g64, 0.7, 500.0, table)
    assert max(kkt_py) < 1e-7
    U_cc, kkt_cc = cpp.solve_qp(H64, g64, table)
    assert max(kkt_cc) < 1e-7, f"native oracle not certified: {kkt_cc}"
    mv = np.repeat(table, 3)
    err = np.max(np.abs((U_cc - U_py) * mv) / (1.0 + np.abs(U_py * mv)))
    assert err < 1e-6, f"cross-oracle disagreement {err:.2e}"


def test_cpp_oracle_swing_forces_zero():
    mpc, robot, H64, g64, table = _mpc_instance(100)
    U_cc, _ = cpp.solve_qp(H64, g64, table)
    mv = np.repeat(table, 3)
    np.testing.assert_allclose(U_cc * (1 - mv), 0.0, atol=1e-12)


def test_cpp_oracle_respects_cone():
    mpc, robot, H64, g64, table = _mpc_instance(340)
    U, _ = cpp.solve_qp(H64, g64, table)
    Ub = U.reshape(-1, 3)
    stance = table > 0.5
    mu = 0.7
    for b in np.flatnonzero(stance):
        fx, fy, fz = Ub[b]
        assert -1e-8 <= fz <= 500.0 + 1e-8
        assert abs(fx) <= mu * fz + 1e-8
        assert abs(fy) <= mu * fz + 1e-8
