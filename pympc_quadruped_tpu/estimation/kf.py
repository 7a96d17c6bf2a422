"""Two-stage state estimator: complementary orientation filter + linear KF.

The reference *documents* this estimator in full (ref
``doc/state_estimation_kf.md:15-115``) but never implements it —
``RobotData(state_estimation=True)`` raises ``NotImplementedError``
(ref ``utils/robot_data.py:81``).  This module completes the design the
reference intended, TPU-style: pure pytree state, fixed-shape updates, fully
batchable, so estimation runs on-device inside the control loop (BASELINE
config 2: "A1 trot with Kalman-filter state estimation in loop").

Stage 1 — orientation (ref state_estimation_kf.md:15-37):
  complementary filter on the gyro with an accelerometer tilt correction:
      q <- q * exp( (omega_meas + k_cf * e_tilt) * dt / 2 )
  where e_tilt is the accel-vs-gravity misalignment in the body frame.

Stage 2 — translation (ref state_estimation_kf.md:39-115):
  18-state linear KF, x = [p(3), v(3), p_f1..p_f4 (12)] with
  process model p' = p + v dt, v' = v + (R a_meas + g) dt, feet constant;
  measurements: per-leg relative foot position from FK (12), per-leg
  relative foot velocity (12), and foot height ~ 0 for stance feet (4).
  Stance gating scales measurement noise by the gait's contact flags
  (high variance for swing feet), keeping shapes static.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.ops import kin, lie

NUM_X = 18  # [p, v, 4 foot positions]


@struct.dataclass
class KfParams:
    dt: jnp.ndarray
    gravity: jnp.ndarray
    k_cf: jnp.ndarray                 # complementary-filter gain
    sigma_proc_pos: jnp.ndarray
    sigma_proc_vel: jnp.ndarray
    sigma_proc_foot_stance: jnp.ndarray
    sigma_proc_foot_swing: jnp.ndarray
    sigma_meas_fk: jnp.ndarray        # relative foot position measurement
    sigma_meas_vel: jnp.ndarray       # leg-odometry velocity measurement
    sigma_meas_height: jnp.ndarray    # stance foot height pseudo-measurement
    swing_noise_boost: jnp.ndarray    # multiplier applied to swing-foot rows
    contact_height: jnp.ndarray       # assumed stance-foot height h_i (doc :104):
                                      # 0 for the point-foot SRB env, the foot
                                      # sphere radius (0.0255 m) for MuJoCo

    @staticmethod
    def default(dt: float = 0.001) -> "KfParams":
        f = jnp.float32
        return KfParams(
            dt=f(dt),
            gravity=f(9.81),
            k_cf=f(0.1),  # kappa_ref of the doc (ref state_estimation_kf.md:35)
            sigma_proc_pos=f(0.02),
            sigma_proc_vel=f(0.2),
            sigma_proc_foot_stance=f(0.002),
            sigma_proc_foot_swing=f(10.0),
            sigma_meas_fk=f(0.002),
            sigma_meas_vel=f(0.05),
            sigma_meas_height=f(0.005),
            swing_noise_boost=f(1.0e4),
            contact_height=f(0.0),
        )


@struct.dataclass
class KfState:
    quat: jnp.ndarray   # (4,) estimated orientation, wxyz
    x: jnp.ndarray      # (18,) [p, v, foot positions]
    P: jnp.ndarray      # (18,18) covariance

    @staticmethod
    def init(pos0: jnp.ndarray, feet0: jnp.ndarray) -> "KfState":
        x = jnp.concatenate([pos0, jnp.zeros(3, jnp.float32), feet0.reshape(-1)])
        return KfState(
            quat=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
            x=x,
            P=jnp.eye(NUM_X, dtype=jnp.float32) * 0.1,
        )


def orientation_update(
    state: KfState, gyro: jnp.ndarray, accel: jnp.ndarray, params: KfParams
) -> jnp.ndarray:
    """Complementary filter tick -> new quaternion (ref doc :15-37).

    The correction gain is modulated down during highly-dynamic phases where
    the accelerometer reading departs from gravity (ref
    ``doc/state_estimation_kf.md:33-35``):
        kappa = k_cf * max(min(1, 1 - ||a - g|| / g), 0)
    """
    R = lie.quat_to_rotmat(state.quat)
    # Gravity direction in body frame vs measured specific force.
    g_body = R.T @ jnp.array([0.0, 0.0, 1.0], jnp.float32)
    a_mag = jnp.linalg.norm(accel)
    a_norm = accel / jnp.maximum(a_mag, 1e-6)
    e_tilt = jnp.cross(a_norm, g_body)
    kappa = params.k_cf * jnp.clip(
        1.0 - jnp.abs(a_mag - params.gravity) / params.gravity, 0.0, 1.0
    )
    omega_corr = gyro + kappa * e_tilt
    return lie.quat_integrate(state.quat, omega_corr, params.dt)


def _process(params: KfParams, quat, accel, x):
    """A x + B u for the 18-state translation model (ref doc :55-75):
    p' = p + v dt + 0.5 a dt^2,  v' = v + a dt,  feet constant, with
    a = R a_meas + a_g the world-frame acceleration."""
    dt = params.dt
    R = lie.quat_to_rotmat(quat)
    acc_world = R @ accel - jnp.array([0.0, 0.0, params.gravity], jnp.float32)
    p, v, feet = x[0:3], x[3:6], x[6:]
    p_new = p + dt * v + 0.5 * dt * dt * acc_world
    v_new = v + dt * acc_world
    return jnp.concatenate([p_new, v_new, feet])


def update(
    state: KfState,
    robot: RobotParams,
    gyro: jnp.ndarray,
    accel: jnp.ndarray,
    q_joints: jnp.ndarray,
    qd_joints: jnp.ndarray,
    contact: jnp.ndarray,  # (4,) stance flags from the gait schedule
    params: KfParams,
) -> KfState:
    """One predict+correct tick.  Fully batchable via vmap."""
    quat = orientation_update(state, gyro, accel, params)
    R = lie.quat_to_rotmat(quat)
    dt = params.dt

    # ---- predict -----------------------------------------------------
    F = jnp.eye(NUM_X, dtype=jnp.float32)
    F = F.at[0:3, 3:6].set(dt * jnp.eye(3, dtype=jnp.float32))
    x_pred = _process(params, quat, accel, state.x)

    foot_sig = jnp.where(
        contact > 0.0, params.sigma_proc_foot_stance, params.sigma_proc_foot_swing
    )
    q_diag = jnp.concatenate(
        [
            jnp.full((3,), params.sigma_proc_pos**2),
            jnp.full((3,), params.sigma_proc_vel**2),
            jnp.repeat(foot_sig**2, 3),
        ]
    )
    P_pred = F @ state.P @ F.T + jnp.diag(q_diag) * dt

    # ---- measurements ------------------------------------------------
    q_legs = q_joints.reshape(4, 3)
    qd_legs = qd_joints.reshape(4, 3)
    p_bf, J = kin.leg_forward_kinematics(robot, q_legs)
    rel_pos_world = p_bf @ R.T                                   # (4,3)
    rel_vel_world = (
        jnp.cross(jnp.broadcast_to(gyro, (4, 3)), p_bf)
        + jnp.einsum("lij,lj->li", J, qd_legs)
    ) @ R.T

    # z1: p_foot - p = rel_pos_world           (12)
    # z2: v (per leg) = -rel_vel_world         (12) for stance legs
    # z3: p_foot_z = 0                         (4)  for stance legs
    m = 12 + 12 + 4
    Hm = jnp.zeros((m, NUM_X), jnp.float32)
    z = jnp.zeros((m,), jnp.float32)
    for leg in range(4):
        r0 = 3 * leg
        Hm = Hm.at[r0 : r0 + 3, 6 + 3 * leg : 9 + 3 * leg].set(
            jnp.eye(3, dtype=jnp.float32)
        )
        Hm = Hm.at[r0 : r0 + 3, 0:3].set(-jnp.eye(3, dtype=jnp.float32))
        z = z.at[r0 : r0 + 3].set(rel_pos_world[leg])
        r1 = 12 + 3 * leg
        Hm = Hm.at[r1 : r1 + 3, 3:6].set(jnp.eye(3, dtype=jnp.float32))
        z = z.at[r1 : r1 + 3].set(-rel_vel_world[leg])
        r2 = 24 + leg
        Hm = Hm.at[r2, 8 + 3 * leg].set(1.0)
        z = z.at[r2].set(params.contact_height)

    boost = params.swing_noise_boost
    leg_boost = jnp.where(contact > 0.0, 1.0, boost)             # (4,)
    r_diag = jnp.concatenate(
        [
            jnp.repeat(params.sigma_meas_fk**2 * jnp.ones(4), 3),
            jnp.repeat(params.sigma_meas_vel**2 * leg_boost, 3),
            params.sigma_meas_height**2 * leg_boost,
        ]
    )

    # ---- correct -----------------------------------------------------
    y = z - Hm @ x_pred
    S = Hm @ P_pred @ Hm.T + jnp.diag(r_diag)
    K = jnp.linalg.solve(S, Hm @ P_pred).T
    x_new = x_pred + K @ y
    P_new = (jnp.eye(NUM_X, dtype=jnp.float32) - K @ Hm) @ P_pred
    # Symmetrize for float32 robustness.
    P_new = 0.5 * (P_new + P_new.T)
    return KfState(quat=quat, x=x_new, P=P_new)


def to_obs(state: KfState, gyro, q_joints, qd_joints) -> kin.RobotObs:
    """Package the estimate as the controller's observation interface."""
    return kin.RobotObs(
        pos_base=state.x[0:3],
        lin_vel_base=state.x[3:6],
        quat_base=state.quat,
        ang_vel_base=gyro,
        q=q_joints,
        qdot=qd_joints,
    )
