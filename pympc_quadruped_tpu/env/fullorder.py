"""Batched full-order articulated environment — the on-TPU IsaacGym analog.

The reference's multi-robot full-order path is IsaacGym PhysX (C++/CUDA)
with a sequential per-robot CPU control loop (ref
``scripts/isaacgym_a1.py:21,119-164``); its single-robot path is MuJoCo C
(ref ``scripts/mujoco_aliengo.py``).  This env closes the same loop entirely
on device: the 18-DoF articulated dynamics of :mod:`pympc_quadruped_tpu.ops.rbd`
(CRBA + RNEA, cross-checked against MuJoCo's ``qacc`` on the *same generated
model* in ``tests/test_rbd.py``), a penalty contact model at the feet, and
the controller driving the 12 joint motors with **torques** — the real
actuation interface, unlike :mod:`srb_env` which applies the MPC's GRFs to
the trunk directly.

Where it sits in the fidelity ladder:

- ``srb_env``      — SRB + pinned feet: the controller's own model; fastest;
- ``fullorder``    — full rigid-body tree + torque actuation + penalty
                     contact: leg inertia back-reaction, swing dynamics and
                     torque-level errors are all real; batched on TPU;
- MuJoCo harness   — full contact solver (host CPU): the offline oracle.

Contact: per-foot sphere-on-plane spring-damper normal force with a
viscous tangential force clamped to the friction cone (the classic penalty
model PhysX/MuJoCo regularized solvers approximate).  Gains are set for
stability at dt = 1 ms given the light foot links (the reflected knee
armature dominates the foot-point effective mass).

Robot support status: Aliengo trots stably (tests/test_rbd.py).  A1 runs
but is marginal here: the reference's A1 config asks for an unreachable
0.42 m standing height on 0.2+0.2 m legs (ref robot_configs.py:42) and uses
700-gain swing PD, which drives the knees to full extension; the implicit
constraint solver in the MuJoCo oracle absorbs the singular transients
(tests/test_mujoco_e2e.py::test_a1_trot_e2e_oracle passes) but the explicit
penalty model amplifies them.  Use the MuJoCo harness for A1 full-order
studies, or command a reachable height.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import GaitParams
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.control import controller as ctrl
from pympc_quadruped_tpu.ops import kin, lie, rbd


def rbd_model(robot: RobotParams, spec) -> rbd.RbdModel:
    """Build the :class:`~pympc_quadruped_tpu.ops.rbd.RbdModel` from the
    same ``RobotParams`` + :class:`~pympc_quadruped_tpu.env.mjcf.MjcfSpec`
    pair the MJCF generator consumes — one source of truth, so the JAX
    dynamics and the generated MuJoCo model are the same model."""
    f32 = jnp.float32
    mirror = jnp.sign(jnp.asarray(robot.hip_len, f32))        # (4,) +1 left, -1 right

    def link_arrays(link):
        com = jnp.asarray(link.com, f32)
        com = jnp.stack(
            [jnp.broadcast_to(com[0], (4,)), mirror * com[1],
             jnp.broadcast_to(com[2], (4,))], axis=-1)         # (4,3) y mirrored
        mass = jnp.full((4,), link.mass, f32)
        inertia = jnp.broadcast_to(jnp.diag(jnp.asarray(link.diag, f32)), (4, 3, 3))
        return mass, com, inertia

    hm, hc, hi = link_arrays(spec.hip)
    tm, tc, ti = link_arrays(spec.thigh)
    cm, cc, ci = link_arrays(spec.calf)

    zeros = jnp.zeros((4,), f32)
    l_thigh = jnp.broadcast_to(jnp.asarray(robot.l_thigh, f32), (4,))
    l_calf = jnp.broadcast_to(jnp.asarray(robot.l_calf, f32), (4,))
    joint_origin = jnp.stack(
        [
            jnp.asarray(robot.hip_offset, f32),                       # hip
            jnp.stack([zeros, jnp.asarray(robot.hip_len, f32), zeros], -1),  # thigh
            jnp.stack([zeros, zeros, -l_thigh], -1),                  # calf
        ],
        axis=1,
    )                                                                  # (4,3,3)
    axis_x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], f32), (4, 3))
    axis_y = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], f32), (4, 3))
    joint_axis = jnp.stack([axis_x, axis_y, axis_y], axis=1)           # (4,3,3)
    foot_offset = jnp.stack([zeros, zeros, -l_calf], axis=-1)          # (4,3)

    return rbd.RbdModel(
        trunk_mass=jnp.asarray(spec.trunk_inertial.mass, f32),
        trunk_com=jnp.asarray(spec.trunk_inertial.com, f32),
        trunk_inertia=jnp.diag(jnp.asarray(spec.trunk_inertial.diag, f32)),
        link_mass=jnp.stack([hm, tm, cm], axis=1),
        link_com=jnp.stack([hc, tc, cc], axis=1),
        link_inertia=jnp.stack([hi, ti, ci], axis=1),
        joint_origin=joint_origin,
        joint_axis=joint_axis,
        foot_offset=foot_offset,
        armature=jnp.full((4, 3), spec.joint_armature, f32),
        damping=jnp.full((4, 3), spec.joint_damping, f32),
        gravity=jnp.float32(9.81),
    )


class ContactParams(struct.PyTreeNode):
    """Penalty-contact gains + actuation/contact saturations.

    The saturations are what keep the explicit dt=1ms integrator stable
    through rough events (falls, near-singular leg extension): MuJoCo's
    implicit constraint solver absorbs those implicitly, a penalty model
    must cap them.  ``fn_max`` mirrors the MPC's own per-foot bound fz_max.
    ``tau_max`` models motor saturation; it defaults HIGH (1 kN*m, i.e.
    effectively unclamped) because the reference applies unclamped torques
    in both of its simulators (ref mujoco_aliengo.py:225, isaacgym_a1.py:162)
    and hardware-level clamping (Aliengo peaks at ~44 N*m) measurably
    changes the closed loop — set it to the real limit for actuator-
    saturation studies.
    """

    kn: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(2.0e4))
    cn: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(150.0))
    kt: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(300.0))
    mu: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.7))
    foot_radius: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0255)
    )
    tau_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1000.0))
    fn_max: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(500.0))


@struct.dataclass
class FullOrderState:
    """Generalized state per scenario."""

    pos: jnp.ndarray    # (3,) world trunk origin
    quat: jnp.ndarray   # (4,) wxyz
    u: jnp.ndarray      # (18,) [omega_body, v_body, qd]
    q: jnp.ndarray      # (12,) joints, FL FR RL RR x (hip, thigh, calf)


def default_init_state(robot: RobotParams) -> FullOrderState:
    """Nominal stance (q = (0, 0.8, -1.6) x 4, ref mujoco_aliengo.py:32-39)
    with the foot spheres resting exactly on the ground.

    The base height comes from the stance FK, not ``base_height_des`` —
    they differ when the desired height is not reachable in the nominal
    stance (the reference's A1 desires 0.42 m on 0.2+0.2 m legs,
    ref robot_configs.py:42); starting feet-on-ground lets the controller
    settle to whatever height it can actually track.
    """
    q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
    p_bf, _ = kin.leg_forward_kinematics(robot, q0.reshape(4, 3))
    # Lowest foot center at one sphere radius (-touchdown_z) above ground.
    z0 = -jnp.min(p_bf[:, 2]) - robot.touchdown_z
    return FullOrderState(
        pos=jnp.array([0.0, 0.0, 1.0], jnp.float32) * z0,
        quat=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        u=jnp.zeros((18,), jnp.float32),
        q=q0,
    )


def foot_kinematics(robot: RobotParams, state: FullOrderState):
    """World positions and velocities of the foot points.

    v_foot = R (v_b + omega x p_bf + J qd) — the full chain rate.
    """
    R = lie.quat_to_rotmat(state.quat)
    q_legs = state.q.reshape(4, 3)
    qd_legs = state.u[6:].reshape(4, 3)
    p_bf, J = kin.leg_forward_kinematics(robot, q_legs)
    v_bf = jnp.einsum("lij,lj->li", J, qd_legs)
    w, v_b = state.u[:3], state.u[3:6]
    v_rel = v_b[None, :] + jnp.cross(jnp.broadcast_to(w, (4, 3)), p_bf) + v_bf
    p_world = state.pos[None, :] + p_bf @ R.T
    v_world = v_rel @ R.T
    return p_world, v_world, R


def contact_forces(
    cp: ContactParams, p_feet: jnp.ndarray, v_feet: jnp.ndarray
) -> jnp.ndarray:
    """(4,3) world-frame penalty contact forces at the foot points.

    Normal: spring-damper on sphere-plane penetration, clamped >= 0 (no
    sticking).  Tangential: viscous, clamped to the mu * Fn Coulomb disc.
    """
    phi = p_feet[:, 2] - cp.foot_radius                      # penetration < 0
    pen = jnp.maximum(-phi, 0.0)
    in_contact = (pen > 0.0).astype(p_feet.dtype)
    fn = jnp.maximum(cp.kn * pen - cp.cn * v_feet[:, 2] * in_contact, 0.0)
    fn = jnp.minimum(fn * in_contact, cp.fn_max)
    ft = -cp.kt * v_feet[:, :2] * in_contact[:, None]
    ft_norm = jnp.linalg.norm(ft, axis=-1, keepdims=True)
    cap = cp.mu * fn[:, None]
    ft = ft * jnp.minimum(1.0, cap / jnp.maximum(ft_norm, 1e-9))
    return jnp.concatenate([ft, fn[:, None]], axis=-1)


def physics_step(
    model: rbd.RbdModel,
    robot: RobotParams,
    cp: ContactParams,
    state: FullOrderState,
    tau: jnp.ndarray,
    dt: jnp.ndarray,
) -> FullOrderState:
    """One semi-implicit Euler step of the torque-driven articulated tree."""
    p_feet, v_feet, R = foot_kinematics(robot, state)
    f_feet = contact_forces(cp, p_feet, v_feet)
    tau = jnp.clip(tau, -cp.tau_max, cp.tau_max)
    du = rbd.forward_dynamics(model, state.q, state.u, R, tau, f_feet)
    u_new = state.u + dt * du
    q_new = state.q + dt * u_new[6:]
    quat_new = lie.quat_integrate(state.quat, u_new[:3], dt)
    pos_new = state.pos + dt * (R @ u_new[3:6])
    return FullOrderState(pos=pos_new, quat=quat_new, u=u_new, q=q_new)


def observe(robot: RobotParams, state: FullOrderState) -> kin.RobotObs:
    """Ground-truth observation in the controller's interface."""
    R = lie.quat_to_rotmat(state.quat)
    return kin.RobotObs(
        pos_base=state.pos,
        lin_vel_base=R @ state.u[3:6],
        quat_base=state.quat,
        ang_vel_base=state.u[:3],
        q=state.q,
        qdot=state.u[6:],
    )


def rollout(
    robot_b: RobotParams,
    mpc: MpcParams,
    gait_b: GaitParams,
    cmd_b: Command,
    num_ticks: int,
    model_b: rbd.RbdModel = None,
    cp: ContactParams = None,
    state0: FullOrderState = None,
    carry0=None,
    solver: str = ctrl.DEFAULT_SOLVER,
    spec=None,
):
    """Batched closed-loop torque-driven rollout under ``lax.scan``.

    Mirrors :func:`srb_env.rollout`'s interface: every robot/gait/cmd leaf
    carries a leading scenario axis.  ``model_b`` defaults to the Aliengo-
    spec dynamic model tiled over the batch (pass a batched model for
    inertial domain randomization).

    Returns ((final_state, final_carry), metrics) with per-tick tracking
    metrics stacked over time.
    """
    from pympc_quadruped_tpu.env import mjcf

    B = jnp.shape(robot_b.mass)[0]
    if model_b is None:
        one = rbd_model(
            jax.tree.map(lambda x: x[0], robot_b), spec or mjcf.aliengo_spec()
        )
        model_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), one
        )
    if cp is None:
        cp = ContactParams()
    if state0 is None:
        state0 = jax.vmap(default_init_state)(robot_b)
    if carry0 is None:
        carry0 = jax.vmap(lambda _: ctrl.init_carry(mpc.horizon))(jnp.arange(B))

    dt = jnp.float32(mpc.dt_control)

    def tick_fn(carry, k):
        env_state, c_carry = carry
        obs = jax.vmap(observe)(robot_b, env_state)
        c_carry, out = ctrl.step_batch(
            robot_b, mpc, gait_b, cmd_b, c_carry, obs, k, solver=solver
        )
        env_state = jax.vmap(
            lambda m, r, s, t: physics_step(m, r, cp, s, t, dt)
        )(model_b, robot_b, env_state, out.torques)
        R = jax.vmap(lie.quat_to_rotmat)(env_state.quat)
        v_world = jnp.einsum("bij,bj->bi", R, env_state.u[:, 3:6])
        vel_des = jnp.einsum("bij,bj->bi", R, cmd_b.vel_base_des)
        metrics = {
            "vel_err": jnp.linalg.norm(v_world[:, :2] - vel_des[:, :2], axis=-1),
            "height": env_state.pos[:, 2],
            "upright": R[:, 2, 2],
        }
        return (env_state, c_carry), metrics

    return jax.lax.scan(
        tick_fn, (state0, carry0), jnp.arange(num_ticks, dtype=jnp.int32)
    )
