"""Condensing tests: gather-based Su/H/g vs a direct float64 block loop.

The oracle's ``_condensed_qp`` rebuilds the reference algebra with explicit
loops (ref linear_mpc/mpc.py:211-235); the JAX path must agree to float32
rounding for arbitrary states/yaws/footholds.
"""
import numpy as np

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.ops import condense, srb
from pympc_quadruped_tpu.oracle import npref

RNG = np.random.default_rng(7)


def _random_problem(h):
    yaw = RNG.uniform(-np.pi, np.pi)
    r_feet = RNG.normal(scale=0.3, size=(4, 3))
    x_t = np.concatenate(
        [
            RNG.normal(scale=0.1, size=3),
            [0.0, 0.0, 0.38] + RNG.normal(scale=0.05, size=3),
            RNG.normal(scale=0.5, size=3),
            RNG.normal(scale=0.8, size=3),
            [-9.81],
        ]
    )
    X_ref = RNG.normal(scale=0.5, size=13 * h)
    return yaw, r_feet, x_t, X_ref


def test_condense_matches_oracle():
    for h in (10, 16):
        mpc = MpcParams(horizon=h)
        robot = aliengo()
        oc = npref.OracleConfig(horizon=h)
        orobot = npref.oracle_aliengo()
        ctrl = npref.OracleController(orobot, oc, npref.OracleGait.trotting10())

        yaw, r_feet, x_t, X_ref = _random_problem(h)
        H64, g64 = ctrl._condensed_qp(x_t, yaw, r_feet, X_ref)

        Ac, Bc = srb.state_space(
            robot, jnp.float32(yaw), jnp.asarray(r_feet, jnp.float32)
        )
        Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
        H, g = condense.condense(
            Ad, Bd, jnp.asarray(x_t, jnp.float32), jnp.asarray(X_ref, jnp.float32), mpc
        )
        scale = np.max(np.abs(H64))
        np.testing.assert_allclose(np.asarray(H), H64, atol=3e-5 * scale)
        gscale = max(np.max(np.abs(g64)), 1.0)
        np.testing.assert_allclose(np.asarray(g), g64, atol=5e-5 * gscale)


def test_rollout_matrices_prediction():
    """Sx/Su must satisfy the rollout recursion x_{k+1} = Ad x_k + Bd u_k."""
    h = 6
    mpc = MpcParams(horizon=h)
    yaw, r_feet, x_t, _ = _random_problem(h)
    Ac, Bc = srb.state_space(
        aliengo(), jnp.float32(yaw), jnp.asarray(r_feet, jnp.float32)
    )
    Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
    Sx, Su = condense.rollout_matrices(Ad, Bd, h)

    U = RNG.normal(scale=30.0, size=12 * h).astype(np.float32)
    X = np.asarray(Sx) @ x_t.astype(np.float32) + np.asarray(Su) @ U

    x = x_t.astype(np.float32)
    Ad_np, Bd_np = np.asarray(Ad), np.asarray(Bd)
    for k in range(h):
        x = Ad_np @ x + Bd_np @ U[12 * k : 12 * k + 12]
        np.testing.assert_allclose(X[13 * k : 13 * k + 13], x, rtol=2e-4, atol=2e-4)


def test_condense_batched():
    h = 10
    mpc = MpcParams(horizon=h)
    probs = [_random_problem(h) for _ in range(3)]
    Ads, Bds, xts, Xrefs = [], [], [], []
    for yaw, r_feet, x_t, X_ref in probs:
        Ac, Bc = srb.state_space(
            aliengo(), jnp.float32(yaw), jnp.asarray(r_feet, jnp.float32)
        )
        Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
        Ads.append(Ad), Bds.append(Bd)
        xts.append(jnp.asarray(x_t, jnp.float32))
        Xrefs.append(jnp.asarray(X_ref, jnp.float32))
    H_b, g_b = jax.vmap(lambda a, b, x, r: condense.condense(a, b, x, r, mpc))(
        jnp.stack(Ads), jnp.stack(Bds), jnp.stack(xts), jnp.stack(Xrefs)
    )
    for i in range(3):
        H_i, g_i = condense.condense(Ads[i], Bds[i], xts[i], Xrefs[i], mpc)
        np.testing.assert_allclose(np.asarray(H_b[i]), np.asarray(H_i), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g_b[i]), np.asarray(g_i), rtol=1e-5, atol=1e-5)


def test_toeplitz_condensing_matches_gram():
    """qp_cost_toeplitz == the Gram condensing to f32 rounding, with
    bitwise-symmetric H.  (A measured NEGATIVE result for the default
    path: 24x fewer FLOPs and faster standalone on TPU, but its assembly
    transpose re-triggers the XLA->custom-call relayout war when composed
    with the solver — docs/performance.md r4.  Kept as a tested
    alternative form of the algebra.)"""
    import numpy as np
    from bench import build_inputs
    from pympc_quadruped_tpu.ops import condense, srb

    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(4, 10, seed=2)

    def both(xi, yi, fi, Xi):
        Ac, Bc = srb.state_space(robot, yi, fi)
        Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
        H1, g1 = condense.condense(Ad, Bd, xi, Xi, mpc)
        H2, g2 = condense.qp_cost_toeplitz(Ad, Bd, xi, Xi, mpc)
        return H1, g1, H2, g2

    H1, g1, H2, g2 = jax.jit(jax.vmap(both))(x_t, yaw, feet, X_ref)
    H1, g1, H2, g2 = map(lambda a: np.asarray(a, np.float64), (H1, g1, H2, g2))
    assert np.abs(H1 - H2).max() / np.abs(H1).max() < 1e-6
    assert np.abs(g1 - g2).max() / (np.abs(g1).max() + 1.0) < 1e-6
    assert np.abs(H2 - H2.transpose(0, 2, 1)).max() == 0.0
