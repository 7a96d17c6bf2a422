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


def test_rho_scale_from_Bd_tracks_mass():
    """The normalization factor is exactly (m_ref/m)^2, geometry-free:
    the v-rows of Bd are dt/m * I3 per leg under the SRB nilpotent ZOH
    (ops/srb.py), so Aliengo (the tuning robot) reads exactly 1.0 and A1
    reads (9.042/4.713)^2 regardless of stance geometry or yaw."""
    from pympc_quadruped_tpu.models.robots import a1

    mpc = MpcParams(horizon=10)
    RNG = np.random.default_rng(3)
    for robot, m in [(aliengo(), 9.042), (a1(), 4.713)]:
        for _ in range(3):
            feet = jnp.asarray(
                np.array([[0.24, 0.13, -0.38], [0.24, -0.13, -0.38],
                          [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]])
                + RNG.normal(scale=0.05, size=(4, 3)), jnp.float32)
            yaw = jnp.float32(RNG.uniform(-1.0, 1.0))
            Ad, Bd = srb.discretize(
                *srb.state_space(robot, yaw, feet), mpc.dt_predict
            )
            s = float(riccati.rho_scale_from_Bd(Bd[None], mpc)[0])
            np.testing.assert_allclose(s, (9.042 / m) ** 2, rtol=1e-5)
    # Per-scenario mass randomization is picked up from the traced Bd.
    rb = aliengo().replace(mass=jnp.float32(12.0))
    Ad, Bd = srb.discretize(
        *srb.state_space(rb, jnp.float32(0.0), feet), mpc.dt_predict
    )
    s = float(riccati.rho_scale_from_Bd(Bd[None], mpc)[0])
    np.testing.assert_allclose(s, (9.042 / 12.0) ** 2, rtol=1e-5)


def test_normalized_mixed_batch_matches_per_scenario_scalar():
    """normalize=True on a mixed Aliengo+A1 batch must equal each scenario
    solved ALONE with its own scaled scalar rho — the per-scenario rho
    plumbing (hu diagonal, splitting updates) is exact, not approximate.
    Also pins that the Aliengo scenario is unchanged by normalization
    (scale exactly 1.0)."""
    from pympc_quadruped_tpu.models.robots import a1

    mpc = MpcParams(horizon=10)
    feet = jnp.asarray(
        [[0.24, 0.13, -0.38], [0.24, -0.13, -0.38],
         [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]], jnp.float32)
    mats = [
        srb.discretize(*srb.state_space(rb, jnp.float32(0.1), feet),
                       mpc.dt_predict)
        for rb in (aliengo(), a1())
    ]
    Ad = jnp.stack([m[0] for m in mats])
    Bd = jnp.stack([m[1] for m in mats])
    x_t = jnp.zeros((2, 13)).at[:, 5].set(0.38).at[:, 12].set(-9.81)
    x_t = x_t.at[:, 9].set(0.4)
    X_ref = jnp.tile(x_t[:, None, :], (1, 10, 1))
    g = npref.OracleGait.trotting10()
    table = jnp.asarray(
        npref.gait_table(g, npref.OracleConfig(horizon=10), 40), jnp.float32
    )[None].repeat(2, axis=0).reshape(2, -1)
    fz = jnp.asarray([500.0, 500.0], jnp.float32)

    base = riccati.RiccatiConfig(iterations=40, rho=4.0e-4)
    U_mix = riccati.solve_batch(
        Ad, Bd, x_t, X_ref, table, fz, mpc,
        base._replace(normalize=True), backend="jnp",
    )
    scales = riccati.rho_scale_from_Bd(Bd, mpc)
    for i in range(2):
        U_i = riccati.solve_batch(
            Ad[i : i + 1], Bd[i : i + 1], x_t[i : i + 1],
            X_ref[i : i + 1], table[i : i + 1], fz[i : i + 1], mpc,
            base._replace(rho=float(base.rho * scales[i])), backend="jnp",
        )
        np.testing.assert_allclose(
            np.asarray(U_mix[i]), np.asarray(U_i[0]), atol=1e-3
        )
    np.testing.assert_allclose(float(scales[0]), 1.0, rtol=1e-6)


def test_a1_fullorder_trot_riccati_normalized():
    """THE behavioral gate normalization exists for: A1 torque-level trot
    with the sparse solver in the loop.  At the fixed Aliengo-optimal rho
    4e-4 this configuration diverges (r5 grid: vel_err 1.58); the
    normalized inloop preset lands A1 at rho_eff 1.47e-3 — inside its
    measured 1e-3..2e-3 band — with Aliengo simultaneously at its own
    optimum (test_h16_fullorder_trot_riccati).  Mirrors
    test_a1_fullorder_closed_loop_trot's band, solver swapped."""
    import jax as _jax

    from pympc_quadruped_tpu.env import fullorder, mjcf
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from test_rbd import _jittered_init, _per_scenario, _pass_band

    B = 4
    mpc = MpcParams(horizon=10)
    tile = lambda t: _jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot1, cp = fullorder.a1_env_config()
    robot = tile(robot1)
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(0.8))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=3000, cp=cp, spec=mjcf.a1_spec(),
        cmd_ramp_ticks=800, state0=_jittered_init(robot, B, seed=21, cp=cp),
        solver="riccati",
    )
    h = _per_scenario(metrics, "height", 500).mean(axis=0)
    v = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    ok = (
        (h > 0.28) & (h < 0.40) & (v < 0.15) & (up > 0.9)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
        & (np.asarray(state.pos[:, 0]) > 1.0)
    )
    _pass_band(ok, B - 1)
