"""Sparse Riccati-ADMM solver tests (ops/qp/riccati.py — the O(h) path).

Same acceptance methodology as tests/test_admm_fast.py: the f64 active-set
oracle self-certified by KKT residuals is ground truth; fixed-iteration f32
quality is assessed in well-posed metrics (cost gap, first-step forces,
cone violation), not raw elementwise distance in the degenerate subspace
(lambda_min(H_reduced) ~ 2R = 4e-5; see tests/test_qp.py header).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.ops import srb
from pympc_quadruped_tpu.ops.qp import riccati
from pympc_quadruped_tpu.oracle import npref


def _instance(tick, horizon=10, gait="trotting10", vx=1.2, vel_err=0.2):
    """A realistic MPC instance with RAW problem data (not just condensed)."""
    RNG = np.random.default_rng(11 + tick)
    mpc = MpcParams(horizon=horizon)
    robot = aliengo()
    ocfg = npref.OracleConfig(horizon=horizon)
    g = getattr(npref.OracleGait, gait)()
    octrl = npref.OracleController(npref.oracle_aliengo(), ocfg, g)
    yaw = RNG.uniform(-0.3, 0.3)
    r_feet = np.array(
        [[0.24, 0.13, -0.38], [0.24, -0.13, -0.38],
         [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]]
    ) + RNG.normal(scale=0.03, size=(4, 3))
    x_t = np.concatenate(
        [RNG.normal(scale=0.05, size=2), [yaw],
         RNG.normal(scale=0.02, size=2), [0.38 + RNG.normal(scale=0.01)],
         RNG.normal(scale=0.3, size=3),
         [vx + RNG.normal(scale=vel_err), RNG.normal(scale=vel_err),
          RNG.normal(scale=0.1)], [-9.81]]
    )
    X_ref = np.zeros((horizon, 13))
    X_ref[:, 2] = yaw
    X_ref[:, 3] = x_t[3] + 0.05 * vx * np.arange(horizon)
    X_ref[:, 5] = 0.38
    X_ref[:, 9] = vx
    X_ref[:, 12] = -9.81
    table = npref.gait_table(g, ocfg, tick)
    H64, g64 = octrl._condensed_qp(x_t, yaw, r_feet, X_ref.reshape(-1))
    H64 = H64.astype(np.float32).astype(np.float64)
    g64 = g64.astype(np.float32).astype(np.float64)
    return mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64


def _solve(mpc, robot, x_t, yaw, r_feet, X_ref, table,
           cfg=riccati.RiccatiConfig(), warm=None, return_duals=False,
           backend="auto"):
    """Solve via each lane's SHIPPING backend: jnp on the CPU lane, the
    batch-minor Pallas kernel on the TPU lane (``backend="auto"``).

    Measured note (r5, TPU lane): the jnp path ON TPU is markedly weaker
    than the kernel on ill-conditioned flight tables — jumping16/h16 cold
    gaps 3.8e-4..6.5e-2 vs the kernel's <= 2.8e-5 (the kernel's unrolled
    FMA chains beat HIGHEST-precision einsum reductions there; trot tables
    agree to ~1e-9).  The jnp path on TPU is a debugging aid, not a
    shipping configuration — gate what ships.
    """
    Ac, Bc = srb.state_space(
        robot, jnp.float32(yaw), jnp.asarray(r_feet, jnp.float32)
    )
    Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
    return riccati.solve_batch(
        Ad[None], Bd[None], jnp.asarray(x_t, jnp.float32)[None],
        jnp.asarray(X_ref, jnp.float32)[None],
        jnp.asarray(table, jnp.float32)[None].reshape(1, -1),
        robot.fz_max, mpc, cfg, backend=backend, warm=warm,
        return_duals=return_duals,
    )


def _oracle(H64, g64, table):
    U, kkt = npref.solve_qp_kkt(H64, g64, 0.7, 500.0, table)
    assert max(kkt) < 1e-7
    return U


def _gap(H64, g64, U, U_star):
    q = lambda u: 0.5 * u @ H64 @ u + g64 @ u
    return (q(U) - q(U_star)) / (abs(q(U_star)) + 1.0)


def test_lqr_factor_is_exact_unconstrained():
    """With rho ~ 0 and one sweep, the Riccati x-update must equal the
    unconstrained optimum of the masked condensed QP — two independent
    derivations of the same algebra (condensing vs dynamic programming)."""
    mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64 = _instance(0)
    mv = np.repeat(table, 3)
    Hm = H64 * np.outer(mv, mv) + np.diag(1.0 - mv)
    gm = g64 * mv
    U_unc = np.linalg.solve(Hm, -gm)
    cfg = riccati.RiccatiConfig(iterations=1, rho=1e-8, sigma=0.0, alpha=1.0)
    U = np.asarray(
        _solve(mpc, robot, x_t, yaw, r_feet, X_ref, table, cfg)[0], np.float64
    )
    # f32 state-space/recursion rounding vs the f64 condensed solve lands
    # in the weak subspace (lambda_min ~ 4e-5); 0.25 N on ~100 N forces.
    assert np.max(np.abs(U - U_unc)) < 0.25, np.max(np.abs(U - U_unc))


@pytest.mark.parametrize("tick", [0, 100, 340, 660])
def test_cold_quality_h10(tick):
    mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64 = _instance(tick)
    U_star = _oracle(H64, g64, table)
    U = np.asarray(
        _solve(mpc, robot, x_t, yaw, r_feet, X_ref, table)[0], np.float64
    )
    assert _gap(H64, g64, U, U_star) < 1e-5
    # First-step vertical forces (what the robot actually feels for 20 ms).
    fz = U.reshape(-1, 4, 3)[0, :, 2]
    fz_star = U_star.reshape(-1, 4, 3)[0, :, 2]
    assert np.max(np.abs(fz - fz_star)) < 1.5, (fz, fz_star)


@pytest.mark.parametrize("gait,h", [("trotting16", 16), ("jumping16", 16)])
def test_cold_quality_h16(gait, h):
    """The flagship-config bar (VERDICT r4 item 4): fz step error < 5%
    and elementwise < 5 N at h=16 — the level the condensed path only
    reached at h=10."""
    for tick in (0, 7, 19):
        mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64 = _instance(
            tick, horizon=h, gait=gait, vx=0.5, vel_err=0.3
        )
        U_star = _oracle(H64, g64, table)
        U = np.asarray(
            _solve(mpc, robot, x_t, yaw, r_feet, X_ref, table)[0], np.float64
        )
        assert _gap(H64, g64, U, U_star) < 1e-4
        assert np.max(np.abs(U - U_star)) < 5.0
        fz = U.reshape(h, 4, 3)[0, :, 2]
        fz_star = U_star.reshape(h, 4, 3)[0, :, 2]
        denom = np.maximum(np.abs(fz_star), 20.0)
        assert np.max(np.abs(fz - fz_star) / denom) < 0.05


def test_respects_friction_cone():
    mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64 = _instance(
        3, vel_err=1.0
    )
    U = np.asarray(
        _solve(mpc, robot, x_t, yaw, r_feet, X_ref, table)[0], np.float64
    )
    f = U.reshape(-1, 4, 3)
    st = table.reshape(-1, 4)
    mu = 0.7
    for k in range(f.shape[0]):
        for leg in range(4):
            fx, fy, fz = f[k, leg]
            if st[k, leg] > 0:
                assert fz > -0.5
                assert abs(fx) <= mu * fz + 1.0
                assert abs(fy) <= mu * fz + 1.0
            else:
                assert abs(fz) < 1e-4  # masked exactly


def test_batched_consistency():
    """A batch of distinct instances matches the per-instance solves.

    Not bitwise: XLA fuses/reassociates the scan bodies differently at
    batch 3 vs batch 1 (measured ~8e-4 N spread); the bar is solver-noise
    scale, mirroring test_admm_fast.test_batched_consistency."""
    insts = [_instance(t) for t in (0, 55, 200)]
    mpc = insts[0][0]
    robot = insts[0][1]
    Ads, Bds, xs, Xrs, tables = [], [], [], [], []
    for _, _, x_t, yaw, r_feet, X_ref, table, _, _ in insts:
        Ac, Bc = srb.state_space(
            robot, jnp.float32(yaw), jnp.asarray(r_feet, jnp.float32)
        )
        Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
        Ads.append(Ad); Bds.append(Bd)
        xs.append(jnp.asarray(x_t, jnp.float32))
        Xrs.append(jnp.asarray(X_ref, jnp.float32))
        tables.append(jnp.asarray(table, jnp.float32).reshape(-1))
    U_batch = riccati.solve_batch(
        jnp.stack(Ads), jnp.stack(Bds), jnp.stack(xs), jnp.stack(Xrs),
        jnp.stack(tables), robot.fz_max, mpc, backend="jnp",
    )
    for i, (_, _, x_t, yaw, r_feet, X_ref, table, _, _) in enumerate(insts):
        U1 = _solve(mpc, robot, x_t, yaw, r_feet, X_ref, table)
        np.testing.assert_allclose(
            np.asarray(U_batch[i]), np.asarray(U1[0]), atol=0.05
        )


def test_warm_start_accelerates():
    """Warm-started from the converged solution, few iterations stay put."""
    mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64 = _instance(100)
    U_star = _oracle(H64, g64, table)
    deep = riccati.RiccatiConfig(iterations=300)
    U0, lam0 = _solve(
        mpc, robot, x_t, yaw, r_feet, X_ref, table, deep, return_duals=True
    )
    few = riccati.RiccatiConfig.inloop()._replace(iterations=10)
    U_warm = _solve(
        mpc, robot, x_t, yaw, r_feet, X_ref, table, few, warm=(U0, lam0)
    )
    U_cold = _solve(mpc, robot, x_t, yaw, r_feet, X_ref, table, few)
    gap_warm = _gap(H64, g64, np.asarray(U_warm[0], np.float64), U_star)
    gap_cold = _gap(H64, g64, np.asarray(U_cold[0], np.float64), U_star)
    assert gap_warm < 1e-6
    assert gap_warm < gap_cold


def test_engine_riccati_solver():
    """engine.solve_scenarios(solver='riccati') routes and masks correctly."""
    from pympc_quadruped_tpu import engine

    mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64 = _instance(0)
    U_star = _oracle(H64, g64, table)
    U = engine.solve_scenarios(
        robot, mpc,
        jnp.asarray(x_t, jnp.float32)[None],
        jnp.asarray(np.float32(yaw))[None],
        jnp.asarray(r_feet, jnp.float32)[None],
        jnp.asarray(X_ref, jnp.float32)[None],
        jnp.asarray(table, jnp.float32)[None].reshape(1, -1),
        solver="riccati",
    )
    fz = np.asarray(U[0]).reshape(4, 3)[:, 2]
    fz_star = U_star.reshape(-1, 4, 3)[0, :, 2]
    assert np.max(np.abs(fz - fz_star)) < 1.5
