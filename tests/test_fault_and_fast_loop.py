"""Round-2 hardening tests:

- the fast ADMM is the closed-loop default and agrees with the parity IPM;
- a NaN-poisoned solve degrades gracefully (previous GRFs held per scenario,
  the reference's implicit behavior, ref ``linear_mpc/mpc.py:99,108``);
- the SRB env synthesizes swing-leg joint velocities from the followed
  trajectory (not the stationary-foot guess);
- engine diagnostics ride along with a sweep solve.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.control import controller as ctrl
from pympc_quadruped_tpu.env import srb_env
from pympc_quadruped_tpu.ops import kin, lie
from pympc_quadruped_tpu.parallel import sweep


def _batched(tree, B):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), tree)


def _setup(B=2, horizon=10):
    mpc = MpcParams(horizon=horizon)
    robot = _batched(aliengo(), B)
    gait = _batched(Gaits.trotting10(), B)
    cmd = _batched(Command.trot_forward(0.6), B)
    state = jax.vmap(srb_env.default_init_state)(robot)
    obs = jax.vmap(srb_env.observe)(robot, state)
    carry = jax.vmap(lambda _: ctrl.init_carry())(jnp.arange(B))
    return mpc, robot, gait, cmd, state, obs, carry


def test_default_solver_is_admm_fast():
    """The cross-robot closed-loop default is the RUIZ-EQUILIBRATED
    condensed path.  The sparse riccati path is faster (4x in-loop at h10,
    12x at h16) and fully gated on Aliengo at both horizons, but its
    warm-started rho is robot-scale sensitive without equilibration (r5
    measurement in controller.py's DEFAULT_SOLVER comment), so it stays
    opt-in per call."""
    assert ctrl.DEFAULT_SOLVER == "admm_fast"


def test_admm_fast_matches_ipm_on_solve_tick():
    """The production solver and the parity IPM agree on the strongly-
    determined content of the solve (total vertical support, force scale).

    Three bars: the in-loop DEFAULT (warm-started preset, 40 iterations —
    here hit COLD because the carry is empty, the worst tick it ever sees)
    must land within 5%; the cold preset (80 iterations) within 1%; a
    converged run (320) within 0.2%.  After the first tick the default
    warm-starts and reaches the converged bar (see
    ``test_warm_start_accuracy``).
    """
    from pympc_quadruped_tpu.ops.qp import admm_fast

    mpc, robot, gait, cmd, state, obs, carry = _setup()
    outs = {}
    for name, kwargs in (
        ("fast_default", dict(solver="admm_fast")),
        (
            "fast_cold80",
            dict(
                solver="admm_fast",
                admm_fast_cfg=admm_fast.AdmmFastConfig(),
            ),
        ),
        (
            "fast_converged",
            dict(
                solver="admm_fast",
                admm_fast_cfg=admm_fast.AdmmFastConfig(iterations=320),
            ),
        ),
        ("ipm", dict(solver="ipm")),
    ):
        _, out = ctrl.step_batch(
            robot, mpc, gait, cmd, carry, obs, jnp.int32(0), **kwargs
        )
        outs[name] = np.asarray(out.contact_forces)
    assert np.all(np.isfinite(outs["fast_default"]))

    def total_fz(f):
        return f.reshape(-1, 4, 3)[:, :, 2].sum(axis=1)

    fz_ipm = total_fz(outs["ipm"])
    np.testing.assert_allclose(total_fz(outs["fast_default"]), fz_ipm, rtol=5e-2)
    np.testing.assert_allclose(total_fz(outs["fast_cold80"]), fz_ipm, rtol=1e-2)
    np.testing.assert_allclose(total_fz(outs["fast_converged"]), fz_ipm, rtol=2e-3)
    # Elementwise: conditioning-limited bar (same as the golden lockstep).
    rel = np.max(
        np.abs(outs["fast_converged"] - outs["ipm"]) / (1.0 + np.abs(outs["ipm"]))
    )
    assert rel < 8e-2, f"fast-vs-ipm GRF spread {rel:.2e}"


def test_nan_poisoned_solve_holds_previous_forces():
    """Scenario 0 gets a NaN observation on the second solve tick; its GRFs
    must hold the previous solution while scenario 1 solves normally."""
    mpc, robot, gait, cmd, state, obs, carry = _setup()
    carry, out0 = ctrl.step_batch(
        robot, mpc, gait, cmd, carry, obs, jnp.int32(0), solver="admm_fast"
    )
    f0 = np.asarray(out0.contact_forces)
    assert np.all(np.isfinite(f0))

    # Advance to the next solve tick with a poisoned scenario-0 observation.
    bad_obs = obs.replace(
        lin_vel_base=obs.lin_vel_base.at[0, 0].set(jnp.nan)
    )
    carry2, out1 = ctrl.step_batch(
        robot, mpc, gait, cmd, carry, bad_obs, jnp.int32(20), solver="admm_fast"
    )
    f1 = np.asarray(out1.contact_forces)
    np.testing.assert_array_equal(f1[0], f0[0])          # held, not NaN
    assert np.all(np.isfinite(f1[1]))                    # healthy scenario solved
    assert not np.array_equal(f1[1], f0[1])              # ... and moved on


def test_observe_swing_foot_velocity_consistent():
    """qdot synthesized by observe() must reproduce the stored world foot
    velocity through the kinematic chain, for moving (swing) feet too."""
    robot = aliengo()
    state = srb_env.default_init_state(robot)
    foot_vel = jnp.array(
        [[0.3, -0.1, 0.4], [0.0, 0.0, 0.0], [-0.2, 0.05, -0.3], [0.0, 0.0, 0.0]],
        jnp.float32,
    )
    state = state.replace(
        vel=jnp.array([0.5, 0.1, -0.05], jnp.float32),
        omega_body=jnp.array([0.2, -0.3, 0.1], jnp.float32),
        foot_vel=foot_vel,
    )
    obs = srb_env.observe(robot, state)
    # Reconstruct world foot velocity from obs: v_base + R(omega x p + J qdot).
    R = lie.quat_to_rotmat(obs.quat_base)
    q_legs = obs.q.reshape(4, 3)
    qd_legs = obs.qdot.reshape(4, 3)
    p_bf, J = kin.leg_forward_kinematics(robot, q_legs)
    dp = jnp.cross(jnp.broadcast_to(obs.ang_vel_base, (4, 3)), p_bf) + jnp.einsum(
        "lij,lj->li", J, qd_legs
    )
    v_foot = obs.lin_vel_base[None, :] + dp @ R.T
    np.testing.assert_allclose(np.asarray(v_foot), np.asarray(foot_vel), atol=2e-5)


def test_warm_start_accuracy():
    """In-loop warm starting (receding-horizon shift of the previous primal
    + duals, controller carry) must beat a cold start at equal iteration
    count on the solves after the first."""
    from pympc_quadruped_tpu.ops.qp import admm_fast

    mpc, robot, gait, cmd, state, obs, carry = _setup()
    nsolves = 4

    def run(iters, cold):
        c = jax.vmap(lambda _: ctrl.init_carry(10))(jnp.arange(2))
        cfg = admm_fast.AdmmFastConfig(iterations=iters)
        out_f = []
        for s in range(nsolves):
            if cold:
                c = c.replace(
                    mpc=c.mpc.replace(
                        qp_primal=jnp.zeros_like(c.mpc.qp_primal),
                        qp_dual=jnp.zeros_like(c.mpc.qp_dual),
                    )
                )
            c, out = ctrl.step_batch(
                robot, mpc, gait, cmd, c, obs, jnp.int32(s * 20),
                solver="admm_fast", admm_fast_cfg=cfg,
            )
            out_f.append(np.asarray(out.contact_forces[0]))
        return np.stack(out_f)

    truth = run(640, cold=True)       # converged, warm-independent
    warm = run(80, cold=False)
    cold = run(80, cold=True)
    err_warm = np.abs(warm - truth).max(axis=1)[1:]   # skip cold first solve
    err_cold = np.abs(cold - truth).max(axis=1)[1:]
    # Warm starting was measured ~4x more accurate on this family; assert a
    # conservative 1.5x mean improvement and an absolute quality bar.
    assert err_warm.mean() < err_cold.mean() / 1.5, (err_warm, err_cold)
    assert err_warm.max() < 1.0, f"warm-start solve error {err_warm} N"


def test_engine_diagnostics_ride_along():
    from pympc_quadruped_tpu import engine
    from pympc_quadruped_tpu.ops import gaitsched

    B, h = 4, 10
    mpc = MpcParams(horizon=h)
    robot = aliengo()
    gait = Gaits.trotting10()
    x_t = jnp.zeros((B, 13), jnp.float32).at[:, 5].set(0.38).at[:, 12].set(-9.81)
    yaw = jnp.zeros((B,), jnp.float32)
    feet = jnp.broadcast_to(
        jnp.array(
            [[0.24, 0.13, -0.38], [0.24, -0.13, -0.38],
             [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]],
            jnp.float32,
        ),
        (B, 4, 3),
    )
    X_ref = jnp.zeros((B, h, 13), jnp.float32).at[:, :, 5].set(0.38).at[:, :, 12].set(-9.81)
    tables = jax.vmap(lambda t: gaitsched.gait_table(gait, mpc, t))(
        jnp.arange(B, dtype=jnp.int32) * 20
    )
    U, diag = engine.solve_scenarios(
        robot, mpc, x_t, yaw, feet, X_ref.reshape(B, -1), tables,
        solver="admm", return_diagnostics=True,
    )
    assert U.shape == (B, 12)
    assert np.all(np.asarray(diag["qp_finite"]) == 1.0)
    assert np.all(np.asarray(diag["qp_primal_violation"]) < 1e-2)
