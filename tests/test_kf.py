"""Two-stage Kalman-filter estimator tests (BASELINE config 2 enabler).

The estimator is validated three ways:

1.  **f64 oracle lockstep** — an independent numpy float64 implementation of
    the reference's documented equations (ref ``doc/state_estimation_kf.md``
    :15-37 orientation filter, :39-115 18-state KF) is driven with the same
    random input sequence; the f32 JAX filter must track it to f32 tolerance.
2.  **Convergence** — initialized with a wrong base position/velocity on a
    standing robot with noisy sensors, the estimate must converge to truth.
3.  **Closed loop** — Aliengo and A1 SRB trots driven by the KF estimate
    instead of ground truth must stay upright with bounded estimate error
    (the feature the reference documents but never implements,
    ref ``utils/robot_data.py:81`` NotImplementedError).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import a1, aliengo
from pympc_quadruped_tpu.env import srb_env
from pympc_quadruped_tpu.estimation import kf
from pympc_quadruped_tpu.ops import kin


# ---------------------------------------------------------------------------
# Independent float64 oracle of doc/state_estimation_kf.md
# ---------------------------------------------------------------------------

def _quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _quat_to_R(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _quat_integrate(q, omega_body, dt):
    ang = omega_body * dt
    th = np.linalg.norm(ang)
    if th < 1e-12:
        dq = np.array([1.0, *(0.5 * ang)])
    else:
        ax = ang / th
        dq = np.array([np.cos(th / 2), *(np.sin(th / 2) * ax)])
    q = _quat_mul(q, dq)
    return q / np.linalg.norm(q)


def _fk_f64(robot, q_legs):
    """Closed-form leg FK + Jacobian in float64 (independent recompute)."""
    hips = np.asarray(robot.hip_offset, np.float64)
    hlen = np.asarray(robot.hip_len, np.float64)
    l1 = float(robot.l_thigh)
    l2 = float(robot.l_calf)
    p = np.zeros((4, 3))
    J = np.zeros((4, 3, 3))
    for leg in range(4):
        q1, q2, q3 = q_legs[leg]

        def fk(qv):
            a, b, c = qv
            # hip roll about x, thigh/calf pitch about y (leg plane)
            x = -l1 * np.sin(b) - l2 * np.sin(b + c)
            z = -l1 * np.cos(b) - l2 * np.cos(b + c)
            y = hlen[leg]
            # roll about x-axis
            ca, sa = np.cos(a), np.sin(a)
            return hips[leg] + np.array([x, ca * y - sa * z, sa * y + ca * z])

        p[leg] = fk(np.array([q1, q2, q3]))
        eps = 1e-7
        for j in range(3):
            dq = np.zeros(3)
            dq[j] = eps
            J[leg, :, j] = (fk(np.array([q1, q2, q3]) + dq) - fk(np.array([q1, q2, q3]) - dq)) / (2 * eps)
    return p, J


def kf_oracle_step(state, robot, gyro, accel, qj, qdj, contact, prm):
    """One predict+correct tick in float64, straight from the doc."""
    quat, x, P = state
    g = float(prm.gravity)
    dt = float(prm.dt)
    # Stage 1: complementary filter with kappa modulation (doc :15-37).
    R = _quat_to_R(quat)
    a_mag = np.linalg.norm(accel)
    e_tilt = np.cross(accel / max(a_mag, 1e-6), R.T @ np.array([0.0, 0.0, 1.0]))
    kappa = float(prm.k_cf) * np.clip(1.0 - abs(a_mag - g) / g, 0.0, 1.0)
    quat = _quat_integrate(quat, gyro + kappa * e_tilt, dt)
    R = _quat_to_R(quat)

    # Stage 2 predict (doc :55-75).
    acc_w = R @ accel - np.array([0.0, 0.0, g])
    F = np.eye(18)
    F[0:3, 3:6] = dt * np.eye(3)
    x_pred = x.copy()
    x_pred[0:3] = x[0:3] + dt * x[3:6] + 0.5 * dt * dt * acc_w
    x_pred[3:6] = x[3:6] + dt * acc_w
    foot_sig = np.where(
        contact > 0, float(prm.sigma_proc_foot_stance), float(prm.sigma_proc_foot_swing)
    )
    qd = np.concatenate(
        [
            np.full(3, float(prm.sigma_proc_pos) ** 2),
            np.full(3, float(prm.sigma_proc_vel) ** 2),
            np.repeat(foot_sig**2, 3),
        ]
    )
    P_pred = F @ P @ F.T + np.diag(qd) * dt

    # Measurements (doc :77-115).
    p_bf, J = _fk_f64(robot, qj.reshape(4, 3))
    rel_pos = p_bf @ R.T
    rel_vel = (
        np.cross(np.broadcast_to(gyro, (4, 3)), p_bf)
        + np.einsum("lij,lj->li", J, qdj.reshape(4, 3))
    ) @ R.T
    H = np.zeros((28, 18))
    z = np.zeros(28)
    for leg in range(4):
        H[3 * leg : 3 * leg + 3, 6 + 3 * leg : 9 + 3 * leg] = np.eye(3)
        H[3 * leg : 3 * leg + 3, 0:3] = -np.eye(3)
        z[3 * leg : 3 * leg + 3] = rel_pos[leg]
        H[12 + 3 * leg : 15 + 3 * leg, 3:6] = np.eye(3)
        z[12 + 3 * leg : 15 + 3 * leg] = -rel_vel[leg]
        H[24 + leg, 8 + 3 * leg] = 1.0
        z[24 + leg] = float(prm.contact_height)
    boost = np.where(contact > 0, 1.0, float(prm.swing_noise_boost))
    rdiag = np.concatenate(
        [
            np.repeat(float(prm.sigma_meas_fk) ** 2 * np.ones(4), 3),
            np.repeat(float(prm.sigma_meas_vel) ** 2 * boost, 3),
            float(prm.sigma_meas_height) ** 2 * boost,
        ]
    )
    y = z - H @ x_pred
    S = H @ P_pred @ H.T + np.diag(rdiag)
    K = np.linalg.solve(S, H @ P_pred).T
    x_new = x_pred + K @ y
    P_new = (np.eye(18) - K @ H) @ P_pred
    P_new = 0.5 * (P_new + P_new.T)
    return (quat, x_new, P_new)


# ---------------------------------------------------------------------------


def test_fk_f64_matches_kin():
    robot = aliengo()
    rng = np.random.default_rng(0)
    q = rng.uniform(-0.5, 0.5, (4, 3)) + np.array([0.0, 0.8, -1.6])
    p64, J64 = _fk_f64(robot, q)
    p32, J32 = kin.leg_forward_kinematics(robot, jnp.asarray(q, jnp.float32))
    np.testing.assert_allclose(np.asarray(p32), p64, atol=1e-6)
    np.testing.assert_allclose(np.asarray(J32), J64, atol=1e-5)


def test_kf_matches_f64_oracle():
    """Random 100-tick drive: the f32 filter lockstep-tracks the f64 oracle."""
    robot = aliengo()
    prm = kf.KfParams.default()
    rng = np.random.default_rng(7)
    state_j = kf.KfState.init(
        jnp.asarray([0.0, 0.0, 0.38], jnp.float32),
        jnp.asarray(
            [[0.24, 0.13, 0.0], [0.24, -0.13, 0.0], [-0.24, 0.13, 0.0], [-0.24, -0.13, 0.0]],
            jnp.float32,
        ),
    )
    state_o = (
        np.array([1.0, 0.0, 0.0, 0.0]),
        np.asarray(state_j.x, np.float64).copy(),
        np.asarray(state_j.P, np.float64).copy(),
    )
    upd = jax.jit(
        lambda s, gy, ac, qj, qd, c: kf.update(s, robot, gy, ac, qj, qd, c, prm)
    )
    q0 = np.tile([0.0, 0.8, -1.6], 4)
    for t in range(100):
        gyro = 0.3 * rng.normal(size=3)
        accel = np.array([0.0, 0.0, 9.81]) + 0.5 * rng.normal(size=3)
        qj = q0 + 0.1 * rng.normal(size=12)
        qdj = 0.5 * rng.normal(size=12)
        contact = (rng.uniform(size=4) > 0.4).astype(np.float64)
        state_j = upd(
            state_j,
            jnp.asarray(gyro, jnp.float32),
            jnp.asarray(accel, jnp.float32),
            jnp.asarray(qj, jnp.float32),
            jnp.asarray(qdj, jnp.float32),
            jnp.asarray(contact, jnp.float32),
        )
        state_o = kf_oracle_step(state_o, robot, gyro, accel, qj, qdj, contact, prm)
    np.testing.assert_allclose(np.asarray(state_j.quat), state_o[0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(state_j.x), state_o[1], atol=5e-4)
    np.testing.assert_allclose(np.asarray(state_j.P), state_o[2], atol=1e-4)


def test_kf_converges_from_wrong_init():
    """Standing robot, noisy sensors, estimate initialized 10 cm / 0.5 m/s
    off: position+velocity must converge under leg-odometry corrections."""
    robot = aliengo()
    prm = kf.KfParams.default()
    state_env = srb_env.default_init_state(robot)
    truth = srb_env.observe(robot, state_env)
    weight = float(robot.mass) * 9.81 / 4.0
    forces = jnp.zeros(12, jnp.float32).at[2::3].set(weight)
    noise = srb_env.SensorNoise.default()

    st = kf.KfState.init(
        truth.pos_base + jnp.asarray([0.1, -0.1, 0.05]),
        state_env.foot_pos,
    )
    st = st.replace(x=st.x.at[3:6].set(jnp.asarray([0.5, -0.5, 0.2])))
    contact = jnp.ones(4, jnp.float32)
    upd = jax.jit(
        lambda s, sn: kf.update(s, robot, sn.gyro, sn.accel, sn.q, sn.qdot, contact, prm)
    )
    key = jax.random.PRNGKey(3)
    for t in range(400):
        sensors = srb_env.synthesize_sensors(
            robot, state_env, forces, jax.random.fold_in(key, t), noise
        )
        st = upd(st, sensors)
    # Absolute x/y is unobservable by design (only the contact height z
    # anchors the world frame — doc :104-115; Cheetah-3's filter drifts in
    # x/y too, and the MPC clamps desired-vs-measured position to 0.1 m
    # anyway, ref mpc.py:121-137).  Assert the observable content: height,
    # velocity, and base-relative foot geometry.
    z_err = abs(float(st.x[2] - truth.pos_base[2]))
    vel_err = np.linalg.norm(np.asarray(st.x[3:6]))
    rel_est = np.asarray(st.x[6:].reshape(4, 3) - st.x[0:3])
    rel_true = np.asarray(state_env.foot_pos - truth.pos_base)
    rel_err = np.abs(rel_est - rel_true).max()
    assert z_err < 0.01, f"height error after 0.4 s: {z_err:.3f} m"
    assert vel_err < 0.05, f"velocity error after 0.4 s: {vel_err:.3f} m/s"
    assert rel_err < 0.01, f"relative foot geometry error: {rel_err:.3f} m"


@pytest.mark.parametrize("robot_fn,name", [(aliengo, "aliengo"), (a1, "a1")])
def test_trot_closed_loop_on_kf_estimates(robot_fn, name):
    """BASELINE config 2: SRB trot driven by the KF estimate (noisy sensors)
    stays upright at commanded height with bounded estimator error — for
    both robots (the reference's A1 never ran with an estimator anywhere)."""
    B = 2
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t)
    robot = tile(robot_fn())
    gait = tile(Gaits.trotting10())
    vx = 1.2 if name == "aliengo" else 1.0
    cmd = tile(Command.trot_forward(vx))
    (state, _), metrics = srb_env.rollout(
        robot, mpc, gait, cmd, num_ticks=600,
        estimator=kf.KfParams.default(),
        key=jax.random.PRNGKey(11),
        auto_reset=False,
    )
    assert not np.any(np.asarray(metrics["diverged"])), "rollout diverged"
    h_des = float(np.asarray(robot_fn().base_height_des))
    h_last = np.asarray(metrics["height"][-200:]).mean()
    assert abs(h_last - h_des) < 0.05, f"height {h_last:.3f} vs {h_des}"
    # Estimator stays locked while trotting (x/y random-walks slowly — see
    # test_kf_converges_from_wrong_init for why absolute x/y is soft).
    assert np.asarray(metrics["est_pos_err"][-200:]).mean() < 0.1
    assert np.asarray(metrics["est_vel_err"][-200:]).mean() < 0.25


def test_measured_contact_gating_disagrees_and_stays_bounded():
    """``contact_source="measured"`` (touch synthesized from the held GRFs)
    vs the planned schedule: the two gates MUST disagree transiently — held
    forces lag the plan by up to one solve period at every stance
    transition — and the KF must stay bounded through that schedule slip
    (the robustness the plan gate never exercises; VERDICT r3 #9; matches
    the reference's touch sensors, ref robot/aliengo/aliengo.xml:244-260)."""
    B = 2
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t)
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(1.0))
    (state, _), metrics = srb_env.rollout(
        robot, mpc, gait, cmd, num_ticks=600,
        estimator=kf.KfParams.default(),
        key=jax.random.PRNGKey(13),
        auto_reset=False,
        contact_source="measured",
    )
    mm = np.asarray(metrics["contact_mismatch"])        # (T,B)
    assert not np.any(np.asarray(metrics["diverged"])), "rollout diverged"
    # Gates genuinely disagree on some ticks (schedule slip exists)...
    assert mm.max() > 0.0, "measured and planned gating never disagreed"
    assert (mm > 0).mean() > 0.01, "disagreement not transiently recurring"
    # ...but agree most of the time (sanity: the touch signal is not junk).
    assert mm.mean() < 0.3, f"gates disagree {mm.mean():.0%} of leg-ticks"
    # KF stays bounded through the slip.
    assert np.asarray(metrics["est_pos_err"][-200:]).mean() < 0.15
    assert np.asarray(metrics["est_vel_err"][-200:]).mean() < 0.25
