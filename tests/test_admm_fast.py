"""Fast-ADMM (Ruiz + Schur-inverse + shared-pattern iteration) tests.

Mirrors the acceptance bars of tests/test_qp.py: the f64 active-set oracle is
ground truth; the throughput solver is judged on cost-optimality gap (the
degenerate internal-force directions make per-component comparison
meaningless at f32 — see test_qp.py module docstring).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.ops.qp import admm_fast
from pympc_quadruped_tpu.ops.qp.admm_fast import AdmmFastConfig

from test_qp import _mpc_instance, _oracle_solution, _masked, _cost_gap

H_STEPS = 10


def _solve_fast(Hm, gm, table, robot, mpc, cfg=AdmmFastConfig(), backend="jnp"):
    return np.asarray(
        admm_fast.solve_batch(
            jnp.asarray(Hm, jnp.float32)[None],
            jnp.asarray(gm, jnp.float32)[None],
            jnp.asarray(table, jnp.float32)[None],
            robot.fz_max,
            mpc,
            cfg,
            backend=backend,
        )[0],
        np.float64,
    )


@pytest.mark.parametrize("tick", [0, 100, 340, 660])
def test_throughput_quality(tick):
    """Cost gap within 1e-5 of scale (10x under the old solver's 1e-4 bar)."""
    mpc, robot, H64, g64, table = _mpc_instance(tick)
    U_star = _oracle_solution(H64, g64, table)
    Hm, gm, mv = _masked(H64, g64, table)
    U = _solve_fast(Hm, gm, table, robot, mpc) * mv
    assert np.all(np.isfinite(U))
    gap = _cost_gap(H64 * np.outer(mv, mv) + np.diag(1 - mv), g64 * mv, U, U_star * mv)
    scale = abs(0.5 * U_star @ H64 @ U_star + g64 @ U_star) + 1.0
    assert gap / scale < 1e-5, f"cost gap {gap:.3e} / scale {scale:.3e}"


def test_solution_respects_friction_cone():
    mpc, robot, H64, g64, table = _mpc_instance(340)
    Hm, gm, mv = _masked(H64, g64, table)
    U = (_solve_fast(Hm, gm, table, robot, mpc) * mv).reshape(H_STEPS, 4, 3)
    stance = table.reshape(H_STEPS, 4)
    mu, tol = 0.7, 1e-2  # fixed-iteration primal feasibility tolerance
    for i in range(H_STEPS):
        for leg in range(4):
            fx, fy, fz = U[i, leg]
            if stance[i, leg]:
                assert -tol <= fz <= 500.0 + tol
                assert abs(fx) <= mu * fz + tol
                assert abs(fy) <= mu * fz + tol
            else:
                np.testing.assert_allclose(U[i, leg], 0.0, atol=1e-6)


def test_batched_consistency():
    """Batched solve == per-scenario solves (SURVEY.md §4 item 3)."""
    insts = [_mpc_instance(t) for t in (0, 100, 340)]
    Hs, gs, tabs = [], [], []
    for mpc, robot, H64, g64, table in insts:
        Hm, gm, mv = _masked(H64, g64, table)
        Hs.append(np.asarray(Hm, np.float32))
        gs.append(np.asarray(gm, np.float32))
        tabs.append(np.asarray(table, np.float32))
    mpc, robot = insts[0][0], insts[0][1]
    U_batch = np.asarray(
        admm_fast.solve_batch(
            jnp.asarray(np.stack(Hs)), jnp.asarray(np.stack(gs)),
            jnp.asarray(np.stack(tabs)), robot.fz_max, mpc,
            AdmmFastConfig(), backend="jnp",
        )
    )
    # Batched and single programs fuse differently; 80 f32 iterations
    # amplify the rounding-order difference along the reduced Hessian's
    # weak (4e-5-eigenvalue) directions — which include TEMPORAL
    # redistribution of support (docs/performance.md).  On CPU the
    # elementwise spread stays ~5e-3 N; on the TPU lane (PYMPC_TPU_TESTS=1)
    # it reaches a few N at equal cost.  The well-posed invariant gated on
    # every backend is the f64 cost of both solutions.
    # (bench r2/r3 measured elementwise deltas up to ~10 N between
    # equal-cost solutions on TPU)
    atol = 1e-2 if jax.default_backend() == "cpu" else 12.0
    for i in range(3):
        U_i = _solve_fast(Hs[i], gs[i], tabs[i], robot, mpc)
        np.testing.assert_allclose(U_batch[i], U_i, atol=atol)
        Hm64 = np.asarray(Hs[i], np.float64)
        gm64 = np.asarray(gs[i], np.float64)
        cost = lambda U: 0.5 * U @ Hm64 @ U + gm64 @ U
        ca, cb = cost(np.asarray(U_batch[i], np.float64)), cost(U_i)
        assert abs(ca - cb) / (abs(cb) + 1.0) < 2e-5, (ca, cb)


def test_spd_inverse_random():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(4, 120, 120)).astype(np.float64)
    K = (A @ A.transpose(0, 2, 1) + 0.5 * np.eye(120)).astype(np.float32)
    X = np.asarray(admm_fast.spd_inverse(jnp.asarray(K), 1), np.float64)
    resid = np.max(np.abs(X @ K.astype(np.float64) - np.eye(120)))
    assert resid < 1e-3, f"inverse residual {resid:.2e}"


def test_spd_inverse_asymmetric_input_regression():
    """1-ulp input asymmetry must not derail the recursion (it amplified to
    O(1) residuals and NaN Kinv pre-symmetrization — see spd_inverse docs)."""
    rng = np.random.default_rng(4)
    A = rng.normal(size=(120, 120))
    K = (A @ A.T + 0.5 * np.eye(120)).astype(np.float32)
    K = K + rng.normal(scale=3e-7, size=K.shape).astype(np.float32)  # break symmetry
    X = np.asarray(admm_fast.spd_inverse(jnp.asarray(K)[None], 1)[0], np.float64)
    Ksym = 0.5 * (K + K.T).astype(np.float64)
    resid = np.max(np.abs(X @ Ksym - np.eye(120)))
    assert np.all(np.isfinite(X))
    assert resid < 1e-3, f"inverse residual {resid:.2e}"


def test_ruiz_scaling_reduces_conditioning():
    mpc, robot, H64, g64, table = _mpc_instance(0)
    Hm, gm, mv = _masked(H64, g64, table)
    H = jnp.asarray(Hm, jnp.float32)[None]
    srow, _, _ = admm_fast.row_bounds(
        jnp.asarray(table, jnp.float32)[None], robot.fz_max, H_STEPS
    )
    Hs, d = admm_fast.ruiz_scaling(H, srow, None, 6)
    Hs64 = np.asarray(Hs[0], np.float64)
    d64 = np.asarray(d[0], np.float64)
    # Consistency: Hs == d H d.
    np.testing.assert_allclose(Hs64, Hm * np.outer(d64, d64), rtol=1e-4, atol=1e-6)
    # Equilibrated rows have ~unit inf-norm.  (Note: Ruiz does NOT shrink
    # the spectral condition number here — the kappa ~ 1e5 comes from the
    # reference's R = 1e-5 near-nullspace, which no diagonal scaling can
    # fix; its value is scale normalization under robot randomization.)
    rn = np.max(np.abs(Hs64), axis=1)
    assert rn.max() < 1.5 and rn.min() > 0.5


def test_row_bounds_per_scenario_fzmax():
    table = np.ones((2, 4 * H_STEPS), np.float32)
    srow, l, u = admm_fast.row_bounds(
        jnp.asarray(table), jnp.asarray([100.0, 300.0], jnp.float32), H_STEPS
    )
    u = np.asarray(u).reshape(2, 4 * H_STEPS, 5)
    np.testing.assert_allclose(u[0, :, 4], 100.0)
    np.testing.assert_allclose(u[1, :, 4], 300.0)
    assert np.all(np.isinf(u[:, :, :4]))


def test_cone_pattern_matches_reference_rows():
    """P0 reproduces the reference pyramid (ref linear_mpc/mpc.py:239-245)
    as a block-diagonal over (step, leg) blocks."""
    P0 = np.asarray(admm_fast.cone_pattern(0.7, 2))  # (40, 24)
    rows = np.array(
        [[1, 0, 0.7], [-1, 0, 0.7], [0, 1, 0.7], [0, -1, 0.7], [0, 0, 1]]
    )
    expect = np.zeros((40, 24))
    for blk in range(8):
        expect[5 * blk : 5 * blk + 5, 3 * blk : 3 * blk + 3] = rows
    np.testing.assert_allclose(P0, expect)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU"
)
@pytest.mark.parametrize("backend", ["pallas", "pallas_fused", "pallas_split", "pallas_full"])
def test_pallas_matches_jnp_quality(backend):
    """TPU-lane quality gate for both kernels: the iterate-only kernel and
    the shipping fused kernel (in-VMEM Schur inversion + iterations) each
    land within f32 solver noise of the certified oracle's cost."""
    mpc, robot, H64, g64, table = _mpc_instance(340)
    U_star = _oracle_solution(H64, g64, table)
    Hm, gm, mv = _masked(H64, g64, table)
    U = _solve_fast(Hm, gm, table, robot, mpc, backend=backend) * mv
    gap = _cost_gap(H64 * np.outer(mv, mv) + np.diag(1 - mv), g64 * mv, U, U_star * mv)
    scale = abs(0.5 * U_star @ H64 @ U_star + g64 @ U_star) + 1.0
    assert gap / scale < 1e-5


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU"
)
@pytest.mark.parametrize("B", [512, 258])
def test_fused_kernel_randomization_stress(B):
    """The in-VMEM Schur inversion holds across heavy domain randomization
    (mass/inertia x e^{+-0.8} ~ 0.45-2.2x): no NaN, plausible support
    forces.  The recursion's conditioning safety margins (Ruiz scaling +
    symmetrization + Newton-Schulz) are exactly what this exercises."""
    from bench import build_inputs  # repo root is on sys.path via conftest
    from pympc_quadruped_tpu import engine
    from pympc_quadruped_tpu.parallel import sweep as psweep

    # B=258: no multiple-of-8 divisor <= the tile — exercises the batch
    # padding path (r3 review fix; an unpadded odd batch would compile a
    # whole-batch VMEM tile).
    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(B, 10, seed=21)
    rb = psweep.randomized_robots(
        robot, B, jax.random.PRNGKey(3), mass_scale=0.8, inertia_scale=0.8
    )
    U = np.asarray(
        engine.solve_scenarios(rb, mpc, x_t, yaw, feet, X_ref, tables, solver="admm")
    )
    assert np.isfinite(U).all()
    fz = U[:, 2::3].sum(-1)
    assert 5.0 < fz.min() and fz.max() < 500.0, (fz.min(), fz.max())


def _kkt_case(B=32, backend="jnp", corrupt=False):
    from bench import build_inputs
    from pympc_quadruped_tpu.control import refmpc
    from pympc_quadruped_tpu.utils import observability

    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(B, H_STEPS, seed=5)
    H, g, mv = jax.jit(jax.vmap(
        lambda xi, yi, fi, Xi, ti: refmpc.build_qp(robot, mpc, xi, yi, fi, Xi, ti)
    ))(x_t, yaw, feet, X_ref, tables)
    g_solve = g * 1.05 if corrupt else g
    U, lam = admm_fast.solve_batch(
        H, g_solve, tables, robot.fz_max, mpc, backend=backend,
        return_duals=True,
    )
    res = observability.kkt_residuals_f64(
        H, g, tables, robot.fz_max, np.asarray(U) * np.asarray(mv), lam, mpc
    )
    return observability.kkt_gate(res, robot.fz_max)


def test_kkt_certificate_passes_and_trips_on_injection():
    """The f64 KKT certificate (stationarity/primal/complementarity of the
    returned (U, lam) against the RAW problem data) passes on a clean solve
    and FAILS on a seeded setup-bug injection (g scaled 5% inside the
    solver only) — the independence property the sibling-comparison parity
    gate lacks (a common-mode setup bug passes both sides of that one)."""
    ok, fields = _kkt_case()
    assert ok, fields
    bad_ok, bad_fields = _kkt_case(corrupt=True)
    assert not bad_ok, bad_fields
    assert bad_fields["kkt_stat_rel_p99"] > 5 * fields["kkt_stat_rel_p99"]


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU"
)
@pytest.mark.parametrize("backend", ["pallas_split", "pallas_full"])
def test_kkt_certificate_kernels(backend):
    """TPU lane: the kernels' own (U, lam) pairs carry a valid f64 KKT
    certificate, and the certificate trips on an injected setup bug."""
    ok, fields = _kkt_case(backend=backend)
    assert ok, fields
    bad_ok, _ = _kkt_case(backend=backend, corrupt=True)
    assert not bad_ok
