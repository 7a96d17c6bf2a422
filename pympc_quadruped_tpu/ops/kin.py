"""Closed-form quadruped leg kinematics — the Pinocchio replacement.

The reference delegates floating-base FK and 3x18 frame Jacobians to
Pinocchio C++ (reference ``utils/robot_data.py:91-133``).  Each leg of these
robots is a fixed hip(x)-thigh(y)-calf(y) chain, so everything Pinocchio was
used for has a small closed form; here it is pure JAX — exact, jittable, and
``vmap``-able over legs, robots, and scenarios.

Frames and conventions
----------------------
- leg order FL, FR, RL, RR; joints (hip, thigh, calf) per leg;
- ``q`` is the (12,) joint vector in that order (MuJoCo sensor order,
  ref ``robot/aliengo/aliengo.xml:229-241``);
- ``quat_base`` is wxyz; ``ang_vel_base`` is the body-frame gyro reading.

The chain, with signed abduction length ``s`` and link lengths ``l2, l3``
(ref aliengo.urdf:98-200):

    p_base_foot = o_hip + Rx(q1) @ ( [0,s,0] + Ry(q2) @ ( [0,0,-l2] + Ry(q3) @ [0,0,-l3] ) )

Reference-parity note (``base_vel_base_feet``): the reference multiplies the
LOCAL_WORLD_ALIGNED Pinocchio Jacobian by a generalized velocity whose first
three entries are the *world*-frame base velocity even though the free-flyer
convention expects the *body* frame (ref ``utils/robot_data.py:158-167``).
This leaves a spurious ``(I - R^T) v_world`` term in the relative foot
velocity.  We reproduce that term so torques match the reference bit-for-bit
in lockstep tests; set ``pinocchio_vel_quirk=False`` for the clean formula.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.ops import lie


@struct.dataclass
class RobotObs:
    """Raw per-tick measurements (the input the reference feeds RobotData.update,
    ref utils/robot_data.py:59-68)."""

    pos_base: jnp.ndarray      # (3,) world
    lin_vel_base: jnp.ndarray  # (3,) world
    quat_base: jnp.ndarray     # (4,) wxyz
    ang_vel_base: jnp.ndarray  # (3,) body-frame gyro
    q: jnp.ndarray             # (12,)
    qdot: jnp.ndarray          # (12,)


@struct.dataclass
class KinState:
    """Everything the controllers consume, derived from one observation
    (the TPU-native equivalent of the reference RobotData attributes,
    ref utils/robot_data.py:95-108)."""

    R_base: jnp.ndarray               # (3,3)
    rpy_base: jnp.ndarray             # (3,)
    pos_base: jnp.ndarray             # (3,)
    lin_vel_base: jnp.ndarray         # (3,)
    ang_vel_base: jnp.ndarray         # (3,) body frame
    base_pos_base_feet: jnp.ndarray   # (4,3) feet rel. base, base frame
    pos_base_feet: jnp.ndarray        # (4,3) feet rel. base, world frame
    pos_feet: jnp.ndarray             # (4,3) feet, world frame
    base_vel_base_feet: jnp.ndarray   # (4,3) foot vel rel. base, base frame
    base_pos_base_thighs: jnp.ndarray # (4,3) thigh joints rel. base, base frame
    jac_feet: jnp.ndarray             # (4,3,3) d(base_pos_base_foot)/d(q_leg)


def leg_forward_kinematics(robot: RobotParams, q_legs: jnp.ndarray):
    """FK for all four legs at once.

    Args:
      q_legs: (4,3) joint angles [hip, thigh, calf] per leg.

    Returns:
      (p, J): (4,3) foot positions and (4,3,3) Jacobians, both in base frame.

    Closed-form Jacobian columns (per leg):
      d/dq1 = (0, -s1*s - c1*w, c1*s - s1*w)
      d/dq2 = (w, s1*u, -c1*u)
      d/dq3 = (-l3*c23, -s1*l3*s23, c1*l3*s23)
    with u, w the sagittal-plane foot coordinates defined below.
    """
    q1, q2, q3 = q_legs[:, 0], q_legs[:, 1], q_legs[:, 2]
    s_hip = robot.hip_len                      # (4,) signed
    l2, l3 = robot.l_thigh, robot.l_calf

    c1, s1 = jnp.cos(q1), jnp.sin(q1)
    c2, s2 = jnp.cos(q2), jnp.sin(q2)
    c23, s23 = jnp.cos(q2 + q3), jnp.sin(q2 + q3)

    # Sagittal plane (hip frame after the abduction rotation):
    u = -l2 * s2 - l3 * s23          # x component
    w = -l2 * c2 - l3 * c23          # z component

    px = u
    py = c1 * s_hip - s1 * w
    pz = s1 * s_hip + c1 * w
    p = robot.hip_offset + jnp.stack([px, py, pz], axis=-1)

    zero = jnp.zeros_like(q1)
    col1 = jnp.stack([zero, -s1 * s_hip - c1 * w, c1 * s_hip - s1 * w], axis=-1)
    col2 = jnp.stack([w, s1 * u, -c1 * u], axis=-1)
    col3 = jnp.stack([-l3 * c23, -s1 * l3 * s23, c1 * l3 * s23], axis=-1)
    J = jnp.stack([col1, col2, col3], axis=-1)  # (4,3,3), columns are dq

    return p, J


def thigh_positions(robot: RobotParams, q_legs: jnp.ndarray) -> jnp.ndarray:
    """(4,3) thigh-joint origins in the base frame (ref robot_data.py:169-184).

    The thigh joint sits at o_hip + Rx(q1) @ [0, s, 0].
    """
    q1 = q_legs[:, 0]
    c1, s1 = jnp.cos(q1), jnp.sin(q1)
    s_hip = robot.hip_len
    off = jnp.stack([jnp.zeros_like(q1), c1 * s_hip, s1 * s_hip], axis=-1)
    return robot.hip_offset + off


def leg_inverse_kinematics(robot: RobotParams, p_base_feet: jnp.ndarray) -> jnp.ndarray:
    """Base-frame foot positions (4,3) -> joint angles (4,3), knee-flexed branch.

    Used by the on-device SRB environment to synthesize joint measurements
    from foot targets; the reference has no IK (feet come from the simulator).
    """
    r = p_base_feet - robot.hip_offset
    s_hip = robot.hip_len
    l2, l3 = robot.l_thigh, robot.l_calf

    ry, rz = r[:, 1], r[:, 2]
    yz_sq = ry * ry + rz * rz
    w_abs = jnp.sqrt(jnp.maximum(yz_sq - s_hip * s_hip, 1e-9))
    w = -w_abs  # knee below the hip
    q1 = jnp.arctan2(rz, ry) - jnp.arctan2(w, s_hip)
    # Wrap to (-pi, pi] so hip angles stay in the physical range.
    q1 = jnp.arctan2(jnp.sin(q1), jnp.cos(q1))

    u = r[:, 0]
    d_sq = u * u + w * w
    # Clip the knee short of full extension: cos(q3) <= cos(0.1) keeps the
    # leg Jacobian invertible when a target is at/beyond reach (e.g. A1's
    # 0.42 m height command vs its 0.40 m leg — the straight-knee singular
    # pose would make the qdot synthesis in srb_env.observe blow up).  The
    # physical calf joints never straighten anyway (upper range -0.65
    # Aliengo / -0.92 A1, ref aliengo.urdf / a1.urdf calf limits).
    cos_q3 = jnp.clip(
        (d_sq - l2 * l2 - l3 * l3) / (2.0 * l2 * l3), -1.0, jnp.cos(0.1)
    )
    q3 = -jnp.arccos(cos_q3)  # knee-flexed (calf angle negative, cf. nominal -1.6)
    s3, c3 = jnp.sin(q3), jnp.cos(q3)
    q2 = jnp.arctan2(-u, -w) - jnp.arctan2(l3 * s3, l2 + l3 * c3)
    q2 = jnp.arctan2(jnp.sin(q2), jnp.cos(q2))
    return jnp.stack([q1, q2, q3], axis=-1)


def compute_kin_state(
    robot: RobotParams, obs: RobotObs, pinocchio_vel_quirk: bool = True
) -> KinState:
    """One-tick state ingest: the TPU equivalent of RobotData.update
    (ref utils/robot_data.py:59-108), with no host round-trips.
    """
    R = lie.quat_to_rotmat(obs.quat_base)
    rpy = lie.quat_to_zyx(obs.quat_base)

    q_legs = obs.q.reshape(4, 3)
    qd_legs = obs.qdot.reshape(4, 3)

    p_bf, J = leg_forward_kinematics(robot, q_legs)
    pos_base_feet = p_bf @ R.T          # world-frame offsets (R @ p per leg)
    pos_feet = obs.pos_base[None, :] + pos_base_feet

    # Relative foot velocity in the base frame:
    #   clean:   omega_b x r_b + J qdot
    #   + quirk: (I - R^T) v_world  (see module docstring)
    rel = jnp.cross(jnp.broadcast_to(obs.ang_vel_base, (4, 3)), p_bf) + jnp.einsum(
        "lij,lj->li", J, qd_legs
    )
    if pinocchio_vel_quirk:
        rel = rel + (obs.lin_vel_base - R.T @ obs.lin_vel_base)[None, :]

    thighs = thigh_positions(robot, q_legs)

    return KinState(
        R_base=R,
        rpy_base=rpy,
        pos_base=obs.pos_base,
        lin_vel_base=obs.lin_vel_base,
        ang_vel_base=obs.ang_vel_base,
        base_pos_base_feet=p_bf,
        pos_base_feet=pos_base_feet,
        pos_feet=pos_feet,
        base_vel_base_feet=rel,
        base_pos_base_thighs=thighs,
        jac_feet=J,
    )
