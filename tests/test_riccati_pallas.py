"""Batch-minor Pallas kernel tests for the sparse Riccati-ADMM path.

CPU lane: the kernel math is checked in Pallas INTERPRET mode against the
jnp reference path at a small horizon (the full h=16 program interprets
too slowly for CI; the step loop is horizon-parametric so h=4 exercises
every code path including wraparound-free indexing, masking and the GJ
inverse).  TPU lane (PYMPC_TPU_TESTS=1): real-kernel parity at h=10/h=16
plus the odd-batch padding path.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.ops import srb
from pympc_quadruped_tpu.ops.qp import riccati, riccati_pallas


def _problem(B, h, seed=0):
    RNG = np.random.default_rng(seed)
    mpc = MpcParams(horizon=h)
    robot = aliengo()
    yaws = jnp.asarray(RNG.uniform(-0.3, 0.3, size=B), jnp.float32)
    feet = jnp.asarray(
        np.array([[0.24, 0.13, -0.38], [0.24, -0.13, -0.38],
                  [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]])[None]
        + RNG.normal(scale=0.03, size=(B, 4, 3)), jnp.float32)
    Ad, Bd = jax.vmap(
        lambda y, p: srb.discretize(*srb.state_space(robot, y, p),
                                    mpc.dt_predict)
    )(yaws, feet)
    x_t = jnp.asarray(RNG.normal(scale=0.2, size=(B, 13)), jnp.float32)
    x_t = x_t.at[:, 5].add(0.38).at[:, 12].set(-9.81)
    X_ref = jnp.asarray(RNG.normal(scale=0.2, size=(B, h, 13)), jnp.float32)
    table = (RNG.uniform(size=(B, 4 * h)) > 0.4).astype(np.float32)
    table[:, :4] = 1.0  # at least one all-stance step
    return mpc, robot, Ad, Bd, x_t, X_ref, jnp.asarray(table)


def _both(mpc, robot, Ad, Bd, x_t, X_ref, table, cfg, interpret):
    m_u, gate = riccati.step_gating(table, mpc.horizon)
    l, u_bnd = riccati.step_bounds(table, robot.fz_max, mpc.horizon)
    hu = riccati.input_cost_diag(m_u, mpc, cfg)
    fac = riccati.lqr_factor(Ad, Bd, hu, m_u, mpc)
    U_jnp, y_jnp = riccati.iterate(
        fac, Ad, x_t, X_ref, gate, l, u_bnd, mpc, cfg
    )
    if interpret:
        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            U_pal, y_pal = riccati_pallas.factor_iterate(
                Ad, Bd, x_t, X_ref, hu, m_u, gate, l, u_bnd, mpc, cfg
            )
        finally:
            pl.pallas_call = orig
    else:
        U_pal, y_pal = riccati_pallas.factor_iterate(
            Ad, Bd, x_t, X_ref, hu, m_u, gate, l, u_bnd, mpc, cfg
        )
    return (np.asarray(U_jnp), np.asarray(y_jnp),
            np.asarray(U_pal), np.asarray(y_pal))


def test_kernel_interpret_matches_jnp_h4():
    cfg = riccati.RiccatiConfig(iterations=6)
    args = _problem(3, 4)
    U_jnp, y_jnp, U_pal, y_pal = _both(*args, cfg, interpret=True)
    # Exact-f32 FMA chains vs HIGHEST-precision einsums: reassociation noise
    # only (measured ~1e-3 N at 100 N force scale).
    np.testing.assert_allclose(U_pal, U_jnp, atol=2e-2)
    np.testing.assert_allclose(y_pal, y_jnp, atol=2e-2)


def test_kernel_interpret_warm_start_h3():
    cfg = riccati.RiccatiConfig(iterations=4)
    mpc, robot, Ad, Bd, x_t, X_ref, table = _problem(2, 3, seed=5)
    m_u, gate = riccati.step_gating(table, mpc.horizon)
    l, u_bnd = riccati.step_bounds(table, robot.fz_max, mpc.horizon)
    hu = riccati.input_cost_diag(m_u, mpc, cfg)
    B, h = 2, 3
    init = (
        jnp.asarray(np.random.default_rng(1).normal(size=(B, h, 12)), jnp.float32),
        jnp.zeros((B, h, 20), jnp.float32),
        jnp.zeros((B, h, 20), jnp.float32),
    )
    fac = riccati.lqr_factor(Ad, Bd, hu, m_u, mpc)
    U_jnp, _ = riccati.iterate(fac, Ad, x_t, X_ref, gate, l, u_bnd, mpc,
                               cfg, init)
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        U_pal, _ = riccati_pallas.factor_iterate(
            Ad, Bd, x_t, X_ref, hu, m_u, gate, l, u_bnd, mpc, cfg, init
        )
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(U_pal), np.asarray(U_jnp), atol=2e-2)


def test_kernel_interpret_per_scenario_rho_h4():
    """Per-scenario rho (the normalization path) through the kernel: a
    batch whose scenarios carry DIFFERENT step sizes must match the jnp
    path given the same (B,) rho — exercises the (1,B) lane-vector rho
    operand and its broadcast against every splitting tile."""
    cfg = riccati.RiccatiConfig(iterations=6, rho=4.0e-4)
    mpc, robot, Ad, Bd, x_t, X_ref, table = _problem(3, 4, seed=9)
    rho_b = jnp.asarray([4.0e-4, 1.5e-3, 8.0e-4], jnp.float32)
    m_u, gate = riccati.step_gating(table, mpc.horizon)
    l, u_bnd = riccati.step_bounds(table, robot.fz_max, mpc.horizon)
    hu = riccati.input_cost_diag(m_u, mpc, cfg, rho_b=rho_b)
    fac = riccati.lqr_factor(Ad, Bd, hu, m_u, mpc)
    U_jnp, y_jnp = riccati.iterate(
        fac, Ad, x_t, X_ref, gate, l, u_bnd, mpc, cfg, rho_b=rho_b
    )
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        U_pal, y_pal = riccati_pallas.factor_iterate(
            Ad, Bd, x_t, X_ref, hu, m_u, gate, l, u_bnd, mpc, cfg,
            rho_b=rho_b,
        )
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(U_pal), np.asarray(U_jnp),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_jnp),
                               atol=2e-2)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU"
)
@pytest.mark.parametrize("h,B", [(10, 256), (16, 256), (16, 130)])
def test_kernel_tpu_matches_jnp(h, B):
    """Real-chip parity at both horizons; B=130 exercises lane padding."""
    cfg = riccati.RiccatiConfig()
    args = _problem(B, h, seed=3)
    U_jnp, y_jnp, U_pal, y_pal = _both(*args, cfg, interpret=False)
    assert np.isfinite(U_pal).all()
    # First-step vertical forces (the behaviorally binding output).
    fz_j = U_jnp.reshape(B, h, 4, 3)[:, 0, :, 2]
    fz_p = U_pal.reshape(B, h, 4, 3)[:, 0, :, 2]
    assert np.max(np.abs(fz_j - fz_p) / np.maximum(np.abs(fz_j), 20.0)) < 0.02
    np.testing.assert_allclose(U_pal, U_jnp, atol=1.0)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU"
)
def test_engine_riccati_tpu_oracle_quality():
    """End-to-end engine route on-chip vs the f64 oracle (h=16)."""
    from test_riccati import _instance, _oracle

    mpc, robot, x_t, yaw, r_feet, X_ref, table, H64, g64 = _instance(
        0, horizon=16, gait="trotting16", vx=0.5, vel_err=0.3
    )
    from pympc_quadruped_tpu import engine

    U_star = _oracle(H64, g64, table)
    U = np.asarray(engine.solve_scenarios(
        robot, mpc,
        jnp.asarray(x_t, jnp.float32)[None],
        jnp.asarray(np.float32(yaw))[None],
        jnp.asarray(r_feet, jnp.float32)[None],
        jnp.asarray(X_ref, jnp.float32)[None],
        jnp.asarray(table, jnp.float32)[None].reshape(1, -1),
        solver="riccati", return_full_horizon=True,
    ), np.float64)[0]
    q = lambda u: 0.5 * u @ H64 @ u + g64 @ u
    assert (q(U) - q(U_star)) / (abs(q(U_star)) + 1.0) < 1e-4
    assert np.max(np.abs(U - U_star)) < 5.0
