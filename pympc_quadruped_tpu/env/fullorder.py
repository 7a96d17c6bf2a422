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

Robot/gait support status (all closed-loop tested, tests/test_rbd.py):
Aliengo TROTS at 1.2 m/s under the reference config, PACES at 0.8 m/s and
BOUNDS at 0.6 m/s — the reference never demonstrates a non-trot gait in
any physics simulator and ships bounding commented out entirely (ref
gait.py:20); A1 trots under :func:`a1_env_config`, which adapts three
reference quirks tuned for the reference's own simulators rather than
physical A1 (see the function docstring).  Bounding's two-leg landings are
what set the contact default kn = 1e4 (see ContactParams).  jumping16
(0.24 s of real flight per cycle) needs the r4 FLIGHT-AWARE reference
(``refmpc._flight_rows``): with it the SRB env survives it cleanly
(tests/test_gait_sweep.py) and THIS env hops continuously without falling
— trough 0.26 m, apex 0.45 m, advancing at the command — but with attitude
wobble (upright_tail ~0.73 at 0.2 m/s, substeps=2): landing torques excite
roll/pitch the 4-step stance window can't fully recapture.  The vanilla
constant-height reference (all the reference's own MPC can express,
ref ``mpc.py:154-168``) falls in BOTH envs.  Standstill->speed command
STEPS are the fragile phase at every speed; ``cmd_ramp_ticks`` (a 0.5 s
ramp) restores robust margins (r3 study).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import struct

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import GaitParams
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.control import controller as ctrl
from pympc_quadruped_tpu.env import terrain as terrain_lib
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


def a1_env_config():
    """A1 configuration for the full-order on-device env: returns
    ``(RobotParams, ContactParams)`` under which A1 trots stably at
    <= 0.8 m/s (the on-TPU analog of the reference's 4xA1 IsaacGym run,
    ref ``scripts/isaacgym_a1.py:57-183``).  The 33.5 N*m hardware torque
    limit is what binds above that: unclamped (as the reference runs ALL
    its robots) A1 also holds 1.0 m/s; the reference's 1.4 m/s command
    (ref :98) tips over here even unclamped — and the reference records no
    evidence of its quality in IsaacGym either.

    Three reference-config quirks are adapted — each is a tuning for the
    reference's OWN simulators, not physical A1, and each was isolated by a
    closed-loop ablation in this env (r3):

    - **true trunk inertia** (the reference's x10 fudge, ref
      robot_configs.py:50, makes the MPC model the body as 10x harder to
      rotate than the simulated dynamics; the resulting attitude
      under-correction tips the robot within ~1 s here — with the true URDF
      inertia the ablation's tail velocity error drops 0.73 -> 0.03);
    - **reachable standing height 0.32 m** (the reference's 0.42 m equals
      full extension of the 0.2+0.2 m legs — the stance Jacobian goes
      singular at touchdown);
    - **swing PD 300** (the 700 gain saturates the 33.5 N*m hardware
      torque limit on touchdown transients).

    ``ContactParams.tau_max`` is the A1 hardware limit (33.5 N*m knee
    rating) — unlike the reference, which applies unclamped torques
    everywhere.
    """
    from pympc_quadruped_tpu.models.robots import a1

    base = a1()
    robot = base.replace(
        inertia=base.inertia / 10.0,
        base_height_des=jnp.float32(0.32),
        kp_swing=jnp.full((3,), 300.0, jnp.float32),
    )
    return robot, ContactParams(tau_max=jnp.float32(33.5))


def a1_isaacgym_parity_config():
    """A1 under the reference's ACTUATION conditions: swing PD Kp = 700
    (ref ``robot_configs.py:55``) and NO torque clamp (the reference applies
    raw torques in both simulators, ref ``isaacgym_a1.py:162``), on the
    tuned dynamics model (true trunk inertia, reachable height — see
    :func:`a1_env_config` for why the reference's model fudges are
    simulator tunings, not robot properties).

    Run it with ``rollout(..., substeps=4)``: the unclamped 700-gain PD
    exceeds the explicit 1 ms integrator's stability margin near leg
    singularities (NaN blowup at 1.2+ m/s with substeps=1) — the
    reference's own simulators are implicit (PhysX TGS / MuJoCo) and absorb
    that stiffness implicitly.

    Measured envelope (r4 grid, docs/a1_parity_experiment.md): even with
    substeps and stiff-contact variants, this configuration does NOT
    sustain the reference's 1.4 m/s command in the penalty-contact env
    (falls near the ~1.0 m/s resonant band or rides at ~0.6 m/s actual);
    the repo's MuJoCo harness (implicit contact) tracks ~1.2 m/s at the
    1.4 command, and the reference itself records no evidence of its
    IsaacGym quality at 1.4 (ref ``scripts/isaacgym_a1.py:98``).  The
    clamped :func:`a1_env_config` at <= 0.8 m/s remains the headline
    on-device A1 claim."""
    from pympc_quadruped_tpu.models.robots import a1

    base = a1()
    robot = base.replace(
        inertia=base.inertia / 10.0,
        base_height_des=jnp.float32(0.32),
        kp_swing=jnp.full((3,), 700.0, jnp.float32),
    )
    return robot, ContactParams()  # tau_max default = effectively unclamped


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

    # kn: r3 closed-loop sweep across gaits settled on 1e4 N/m — the earlier
    # 2e4 under-damped bounding's two-leg landings (the robot ends on its
    # belly: h_tail 0.07) and left a narrow trot instability band near
    # 1.0 m/s; at 1e4 (static penetration ~9 mm under Aliengo's weight)
    # trot 1.0/1.2, pace 0.8, bound 0.6 and A1's trot all hold
    # upright_tail >= 0.98 under a 0.5 s command ramp.
    kn: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0e4))
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


def default_init_state(
    robot: RobotParams, foot_radius=None
) -> FullOrderState:
    """Nominal stance (q = (0, 0.8, -1.6) x 4, ref mujoco_aliengo.py:32-39)
    with the foot spheres resting exactly on the ground.

    The base height comes from the stance FK, not ``base_height_des`` —
    they differ when the desired height is not reachable in the nominal
    stance (the reference's A1 desires 0.42 m on 0.2+0.2 m legs,
    ref robot_configs.py:42); starting feet-on-ground lets the controller
    settle to whatever height it can actually track.

    ``foot_radius`` must be the SAME radius the contact model uses
    (``ContactParams.foot_radius``) or the batch starts penetrating/
    hovering; it defaults to ``-robot.touchdown_z``, which equals the
    ``ContactParams`` default.  :func:`rollout` always passes its actual
    contact radius.
    """
    if foot_radius is None:
        foot_radius = -robot.touchdown_z
    q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
    p_bf, _ = kin.leg_forward_kinematics(robot, q0.reshape(4, 3))
    # Lowest foot center at one sphere radius above ground.
    z0 = -jnp.min(p_bf[:, 2]) + foot_radius
    return FullOrderState(
        pos=jnp.array([0.0, 0.0, 1.0], jnp.float32) * z0,
        quat=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        u=jnp.zeros((18,), jnp.float32),
        q=q0,
    )


def init_state_on_terrain(
    robot: RobotParams, terrain: terrain_lib.Terrain, foot_radius=None
) -> FullOrderState:
    """Nominal stance settled on the local terrain surface (mean foot-patch
    height; the contact springs absorb the residual per-foot mismatch in the
    first few ms, as on real ground)."""
    s = default_init_state(robot, foot_radius)
    R = lie.quat_to_rotmat(s.quat)
    p_bf, _ = kin.leg_forward_kinematics(robot, s.q.reshape(4, 3))
    feet_xy = (s.pos[None, :] + p_bf @ R.T)[:, :2]
    gz = terrain_lib.height_at(terrain, feet_xy)
    return s.replace(pos=s.pos.at[2].add(jnp.mean(gz)))


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
    cp: ContactParams, p_feet: jnp.ndarray, v_feet: jnp.ndarray,
    ground_z: jnp.ndarray = 0.0,
) -> jnp.ndarray:
    """(4,3) world-frame penalty contact forces at the foot points.

    Normal: spring-damper on sphere-plane penetration, clamped >= 0 (no
    sticking).  Tangential: viscous, clamped to the mu * Fn Coulomb disc.

    ``ground_z`` is the per-foot support-surface height (terrain query;
    0 for the flat world).  The contact normal stays vertical — the same
    height-field approximation the SRB env makes, adequate for the terrain
    library's small slopes (ref terrain generation:
    ``utils/isaacgym_utils.py:267-312``).
    """
    phi = p_feet[:, 2] - ground_z - cp.foot_radius           # penetration < 0
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
    terrain: terrain_lib.Terrain | None = None,
) -> tuple[FullOrderState, jnp.ndarray]:
    """One semi-implicit Euler step of the torque-driven articulated tree.

    Returns ``(new_state, f_feet)`` — the (4,3) world contact forces ride
    along so callers can gate estimators on MEASURED touch (the real foot
    sensor, ref ``aliengo.xml:244-260`` touch sensors) instead of the plan.
    """
    p_feet, v_feet, R = foot_kinematics(robot, state)
    if terrain is not None:
        ground_z = terrain_lib.height_at(terrain, p_feet[:, :2])
    else:
        ground_z = jnp.zeros((4,), p_feet.dtype)
    f_feet = contact_forces(cp, p_feet, v_feet, ground_z)
    tau = jnp.clip(tau, -cp.tau_max, cp.tau_max)
    du = rbd.forward_dynamics(model, state.q, state.u, R, tau, f_feet)
    u_new = state.u + dt * du
    q_new = state.q + dt * u_new[6:]
    quat_new = lie.quat_integrate(state.quat, u_new[:3], dt)
    pos_new = state.pos + dt * (R @ u_new[3:6])
    return FullOrderState(pos=pos_new, quat=quat_new, u=u_new, q=q_new), f_feet


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


def _diverged(state: FullOrderState, ground_z: jnp.ndarray) -> jnp.ndarray:
    """(B,) divergence flags: non-finite state or implausible trunk pose
    relative to the local ground (SURVEY.md §5.3; the reference's only
    recovery is a blanket periodic reset, ref ``isaacgym_a1.py:174-177``)."""
    finite = (
        jnp.all(jnp.isfinite(state.pos), axis=-1)
        & jnp.all(jnp.isfinite(state.quat), axis=-1)
        & jnp.all(jnp.isfinite(state.u), axis=-1)
        & jnp.all(jnp.isfinite(state.q), axis=-1)
    )
    rel_h = state.pos[:, 2] - ground_z
    plausible = (
        (rel_h > 0.08)
        & (rel_h < 1.0)
        & (jnp.linalg.norm(state.u[:, 3:6], axis=-1) < 10.0)
    )
    return ~(finite & plausible)


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
    terrain=None,
    auto_reset: bool = False,
    estimator=None,
    sensor_noise=None,
    key=None,
    cmd_ramp_ticks: int | None = None,
    substeps: int = 1,
    tick0: int = 0,
    solver_cfg=None,
):
    """Batched closed-loop torque-driven rollout under ``lax.scan``.

    ``solver_cfg``: optional dict of solver-config kwargs forwarded to
    :func:`controller.step_batch` (e.g. ``{"riccati_cfg": ...}``), same
    contract as :func:`srb_env.rollout`.

    Mirrors :func:`srb_env.rollout`'s interface: every robot/gait/cmd leaf
    carries a leading scenario axis.  ``model_b`` defaults to the Aliengo-
    spec dynamic model tiled over the batch (pass a batched model for
    inertial domain randomization).

    Feature parity with the SRB sibling (and the reference's full-physics
    path, ref ``utils/isaacgym_utils.py:267-312`` terrain):

    - ``terrain``: batched heightfield; contact queries the local support
      height under each foot;
    - ``auto_reset``: per-scenario divergence detection + snap-back to the
      initial state (off by default to preserve raw dynamics studies);
    - ``cmd_ramp_ticks``: linear command spin-up from standstill
      (``Command.ramped``) — the full-order step transient is knife-edge
      (see the method's docstring for the r3 measurements); default off to
      match the reference's instant command step;
    - ``estimator``: drive the controller from the two-stage KF on noisy
      IMU/encoder sensors, gated by MEASURED foot contact (normal force
      > 1 N) — the real contact timing of the articulated dynamics, not the
      gait plan (the robust gating the MuJoCo harness uses,
      ``examples/mujoco_closed_loop.py``).

    Returns ((final_state, final_carry), metrics) with per-tick tracking
    metrics stacked over time (incl. ``diverged`` flags and, with the
    estimator, position/velocity estimate errors).
    """
    from pympc_quadruped_tpu.env import mjcf
    from pympc_quadruped_tpu.env import srb_env
    from pympc_quadruped_tpu.estimation import kf

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
        if terrain is not None:
            state0 = jax.vmap(
                lambda r, t: init_state_on_terrain(r, t, cp.foot_radius)
            )(robot_b, terrain)
        else:
            state0 = jax.vmap(
                lambda r: default_init_state(r, cp.foot_radius)
            )(robot_b)
    if carry0 is None:
        carry0 = jax.vmap(lambda _: ctrl.init_carry(mpc.horizon))(jnp.arange(B))

    use_kf = estimator is not None
    if use_kf:
        if sensor_noise is None:
            sensor_noise = srb_env.SensorNoise.default()
        if key is None:
            key = jax.random.PRNGKey(0)
        feet0, vfeet0, _ = jax.vmap(foot_kinematics)(robot_b, state0)
        kf0 = jax.vmap(lambda s, f: kf.KfState.init(s.pos, f))(state0, feet0)
        R0 = jax.vmap(lie.quat_to_rotmat)(state0.quat)
        vworld0 = jnp.einsum("bij,bj->bi", R0, state0.u[:, 3:6])
        if terrain is not None:
            gz0 = jax.vmap(lambda t, p: terrain_lib.height_at(t, p[:, :2]))(
                terrain, feet0
            )
        else:
            gz0 = jnp.zeros((B, 4), jnp.float32)
        f0 = jax.vmap(contact_forces, in_axes=(None, 0, 0, 0))(
            cp, feet0, vfeet0, gz0
        )
        carry0 = (carry0, kf0, vworld0, f0)

    dt = jnp.float32(mpc.dt_control)
    # ``substeps`` > 1 integrates the articulated dynamics at dt/substeps
    # under a zero-order-held torque command (what MuJoCo/PhysX do with
    # their internal steps at a 1 kHz control rate).  Needed for stiff
    # unclamped actuation configs: the reference's A1 swing PD of 700
    # (ref robot_configs.py:55) with no torque clamp exceeds the explicit
    # 1 ms integrator's stability margin near leg singularities — its own
    # simulators are implicit (PhysX TGS / MuJoCo), so parity studies of
    # that config need the finer step (see a1_isaacgym_parity_config).
    sub_dt = dt / jnp.float32(substeps)

    def _integrate(m, r, s, t, tr=None):
        if substeps == 1:
            return (physics_step(m, r, cp, s, t, dt, tr) if tr is not None
                    else physics_step(m, r, cp, s, t, dt))

        def one(s_, _):
            if tr is not None:
                s2, f = physics_step(m, r, cp, s_, t, sub_dt, tr)
            else:
                s2, f = physics_step(m, r, cp, s_, t, sub_dt)
            return s2, f

        s_final, fs = jax.lax.scan(one, s, None, length=substeps)
        # Report the tick's MEAN substep force (= contact impulse / dt),
        # not the last substep's instantaneous sample: a foot that carried
        # load early in the tick but unloaded by the final substep would
        # otherwise read ~0 N to force-derived metrics and to the measured-
        # contact KF gate, flickering the gate at touchdown (r4 advisor).
        # The impulse average is the physically meaningful 1 kHz force
        # sample; substeps == 1 is unchanged.
        return s_final, jnp.mean(fs, axis=0)

    def tick_fn(carry, k):
        env_state, inner = carry
        if use_kf:
            c_carry, kf_state, prev_vworld, prev_f_feet = inner
            # IMU/encoder synthesis from the articulated state.  Specific
            # force = trunk acceleration + g, in the body frame: the finite
            # difference of the world velocity over the last step is the
            # true accelerometer signal (reads +g at rest).
            R = jax.vmap(lie.quat_to_rotmat)(env_state.quat)
            vworld = jnp.einsum("bij,bj->bi", R, env_state.u[:, 3:6])
            a_spec = jnp.einsum(
                "bji,bj->bi", R,
                (vworld - prev_vworld) / dt
                + jnp.array([0.0, 0.0, 1.0], jnp.float32) * mpc.gravity,
            )
            keys = jax.random.split(jax.random.fold_in(key, k), 4)
            n = lambda kk, shape, sig: sig * jax.random.normal(kk, (B,) + shape, jnp.float32)
            gyro = env_state.u[:, :3] + n(keys[0], (3,), sensor_noise.gyro)
            accel = a_spec + n(keys[1], (3,), sensor_noise.accel)
            q_m = env_state.q + n(keys[2], (12,), sensor_noise.encoder_q)
            qd_m = env_state.u[:, 6:] + n(keys[3], (12,), sensor_noise.encoder_qd)
            # MEASURED contact gating: feet with real normal force from the
            # LAST physics step (threaded through the carry, like every
            # other sensor here is a last-step quantity) — no duplicate
            # FK/contact evaluation per tick.
            touch = (prev_f_feet[:, :, 2] > 1.0).astype(jnp.float32)
            kf_state = jax.vmap(
                lambda st, r, g_, a_, qm, qdm, c: kf.update(
                    st, r, g_, a_, qm, qdm, c, estimator
                )
            )(kf_state, robot_b, gyro, accel, q_m, qd_m, touch)
            obs = jax.vmap(kf.to_obs)(kf_state, gyro, q_m, qd_m)
        else:
            c_carry = inner
            obs = jax.vmap(observe)(robot_b, env_state)
        cmd_eff = (
            cmd_b if cmd_ramp_ticks is None else cmd_b.ramped(k, cmd_ramp_ticks)
        )
        c_carry, out = ctrl.step_batch(
            robot_b, mpc, gait_b, cmd_eff, c_carry, obs, k, solver=solver,
            **(solver_cfg or {}),
        )
        if terrain is not None:
            env_state, f_feet = jax.vmap(
                lambda m, r, s, t, tr: _integrate(m, r, s, t, tr)
            )(model_b, robot_b, env_state, out.torques, terrain)
            ground_b = jax.vmap(
                lambda t, p: jnp.mean(terrain_lib.height_at(t, p[None, :2]))
            )(terrain, env_state.pos)
        else:
            env_state, f_feet = jax.vmap(
                lambda m, r, s, t: _integrate(m, r, s, t)
            )(model_b, robot_b, env_state, out.torques)
            ground_b = jnp.zeros((B,), jnp.float32)

        bad = _diverged(env_state, ground_b)
        if use_kf:
            # Carry the PRE-step world velocity (computed above from the
            # state this tick entered with): next tick's finite difference
            # is then the velocity change across THIS tick's physics step —
            # the true trunk acceleration.  (Carrying the post-step value
            # made the difference identically zero: the accelerometer read
            # pure gravity forever — r3 review finding.)
            new_inner = (c_carry, kf_state, vworld, f_feet)
        else:
            new_inner = c_carry
        if auto_reset:
            pick = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(
                    bad.reshape((B,) + (1,) * (x.ndim - 1)), x, y
                ),
                a, b,
            )
            env_state = pick(state0, env_state)
            new_inner = pick(carry0, new_inner)

        R = jax.vmap(lie.quat_to_rotmat)(env_state.quat)
        v_world = jnp.einsum("bij,bj->bi", R, env_state.u[:, 3:6])
        vel_des = jnp.einsum("bij,bj->bi", R, cmd_eff.vel_base_des)
        metrics = {
            "vel_err": jnp.linalg.norm(v_world[:, :2] - vel_des[:, :2], axis=-1),
            "height": env_state.pos[:, 2],
            "upright": R[:, 2, 2],
            "diverged": bad,
        }
        if use_kf:
            est = new_inner[1]
            metrics["est_pos_err"] = jnp.linalg.norm(
                est.x[:, 0:3] - env_state.pos, axis=-1
            )
            metrics["est_vel_err"] = jnp.linalg.norm(
                est.x[:, 3:6] - v_world, axis=-1
            )
        return (env_state, new_inner), metrics

    # ``tick0`` offsets the shared tick counter so chunked callers (the
    # batch viewer, resume flows) continue the gait phase instead of
    # restarting it — mirrors srb_env.rollout(tick0=...).
    (final_state, final_inner), metrics = jax.lax.scan(
        tick_fn, (state0, carry0),
        jnp.arange(num_ticks, dtype=jnp.int32) + jnp.int32(tick0),
    )
    final_carry = final_inner[0] if use_kf else final_inner
    return (final_state, final_carry), metrics
