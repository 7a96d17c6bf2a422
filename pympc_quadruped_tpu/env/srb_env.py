"""Batched on-device single-rigid-body rollout environment.

The reference closes its loop through MuJoCo (single robot, C, host-side) or
IsaacGym PhysX (4 robots, per-robot host round-trips every tick —
ref ``scripts/isaacgym_a1.py:119-164``).  The TPU-native equivalent is a pure
JAX SRB physics rollout that lives entirely on device:

- the trunk is a single rigid body forced by the MPC's ground-reaction
  forces (the exact model the MPC assumes, so closed-loop behavior isolates
  controller correctness from contact-model error);
- stance feet are pinned where they touched down; swing feet follow the
  controller's swing trajectory kinematically (massless-leg assumption, the
  same one the reference's swing PD makes, ref leg_controller.py:17-20);
- joint measurements are synthesized by closed-form IK so the controller
  consumes the same observation interface as with a real simulator;
- everything vmaps over scenarios and runs under ``lax.scan`` over ticks.

The MuJoCo harness in ``examples/mujoco_closed_loop.py`` is the full-order
oracle counterpart (torque-level, CPU).
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
from pympc_quadruped_tpu.estimation import kf
from pympc_quadruped_tpu.ops import gaitsched, kin, lie


@struct.dataclass
class SrbState:
    """World-frame rigid-body state + foot bookkeeping (per scenario)."""

    pos: jnp.ndarray        # (3,)
    quat: jnp.ndarray       # (4,) wxyz
    vel: jnp.ndarray        # (3,) world
    omega_body: jnp.ndarray # (3,) body frame
    foot_pos: jnp.ndarray   # (4,3) world; stance feet pinned here
    foot_vel: jnp.ndarray   # (4,3) world foot velocity; zero for stance feet


def default_init_state(robot: RobotParams) -> SrbState:
    """Nominal stance matching the reference reset (ref mujoco_aliengo.py:32-39)."""
    q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4).reshape(4, 3)
    p_bf, _ = kin.leg_forward_kinematics(robot, q0)
    pos = jnp.array([0.0, 0.0, 0.0], jnp.float32).at[2].set(robot.base_height_des)
    feet = pos[None, :] + p_bf
    feet = feet.at[:, 2].set(0.0)
    return SrbState(
        pos=pos,
        quat=jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
        vel=jnp.zeros(3, jnp.float32),
        omega_body=jnp.zeros(3, jnp.float32),
        foot_pos=feet,
        foot_vel=jnp.zeros((4, 3), jnp.float32),
    )


def observe(robot: RobotParams, state: SrbState) -> kin.RobotObs:
    """Synthesize the controller's observation from SRB state via IK."""
    R = lie.quat_to_rotmat(state.quat)
    p_bf = (state.foot_pos - state.pos[None, :]) @ R
    q_legs = kin.leg_inverse_kinematics(robot, p_bf)
    # Joint velocities from the kinematic chain rate:
    #   v_foot_world = v_base + R (omega_b x p_bf) + R (J qdot)
    # => J qdot = R^T (v_foot - v_base) - omega_b x p_bf.
    # Stance feet carry foot_vel = 0 (pinned); swing feet carry the world
    # velocity of their followed trajectory, so the controller's swing
    # damping term sees the true rates instead of a stationary-foot guess.
    _, J = kin.leg_forward_kinematics(robot, q_legs)
    v_rel = (state.foot_vel - state.vel[None, :]) @ R - jnp.cross(
        jnp.broadcast_to(state.omega_body, (4, 3)), p_bf
    )
    qdot_legs = lie.solve3(J, v_rel)
    return kin.RobotObs(
        pos_base=state.pos,
        lin_vel_base=state.vel,
        quat_base=state.quat,
        ang_vel_base=state.omega_body,
        q=q_legs.reshape(12),
        qdot=qdot_legs.reshape(12),
    )


@struct.dataclass
class RawSensors:
    """IMU + encoder feed — the on-device analog of the reference's
    raw-sensor input mode (ref ``scripts/mujoco_aliengo.py:101-118``:
    framequat, gyro, accelerometer, 12 jointpos, 12 jointvel)."""

    quat: jnp.ndarray   # (4,) wxyz orientation (IMU fusion output)
    gyro: jnp.ndarray   # (3,) body-frame angular velocity
    accel: jnp.ndarray  # (3,) body-frame specific force (includes +g at rest)
    q: jnp.ndarray      # (12,) joint encoders
    qdot: jnp.ndarray   # (12,)


@struct.dataclass
class SensorNoise:
    gyro: jnp.ndarray
    accel: jnp.ndarray
    encoder_q: jnp.ndarray
    encoder_qd: jnp.ndarray

    @staticmethod
    def default() -> "SensorNoise":
        f = jnp.float32
        return SensorNoise(
            gyro=f(0.01), accel=f(0.05), encoder_q=f(0.001), encoder_qd=f(0.02)
        )

    @staticmethod
    def zero() -> "SensorNoise":
        f = jnp.float32
        return SensorNoise(gyro=f(0.0), accel=f(0.0), encoder_q=f(0.0), encoder_qd=f(0.0))


def synthesize_sensors(
    robot: RobotParams,
    state: SrbState,
    forces: jnp.ndarray,   # (12,) world GRFs applied over the last step
    key,
    noise: SensorNoise,
) -> RawSensors:
    """Noisy IMU + encoder readings from the SRB state.

    The accelerometer reports specific force: for the SRB,
    a_world = sum(F)/m - g e_z, so the reading is R^T (a_world + g e_z)
    = R^T sum(F)/m — exactly +g on the z axis at static stance.
    """
    R = lie.quat_to_rotmat(state.quat)
    a_spec = R.T @ (forces.reshape(4, 3).sum(axis=0) / robot.mass)
    truth = observe(robot, state)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = lambda k, shape, sig: sig * jax.random.normal(k, shape, jnp.float32)
    return RawSensors(
        quat=state.quat,
        gyro=state.omega_body + n(k1, (3,), noise.gyro),
        accel=a_spec + n(k2, (3,), noise.accel),
        q=truth.q + n(k3, (12,), noise.encoder_q),
        qdot=truth.qdot + n(k4, (12,), noise.encoder_qd),
    )


def init_state_on_terrain(robot: RobotParams, terrain: terrain_lib.Terrain) -> SrbState:
    """Nominal stance with feet settled on the local ground surface."""
    s = default_init_state(robot)
    gz = terrain_lib.height_at(terrain, s.foot_pos[:, :2])
    feet = s.foot_pos.at[:, 2].set(gz)
    return s.replace(
        pos=s.pos.at[2].add(jnp.mean(gz)),
        foot_pos=feet,
    )


def physics_step(
    robot: RobotParams,
    mpc: MpcParams,
    state: SrbState,
    forces: jnp.ndarray,       # (12,) world GRFs (stance legs)
    swing_states: jnp.ndarray, # (4,)
    swing_pos_world: jnp.ndarray,  # (4,3) desired world swing-foot positions
    terrain: terrain_lib.Terrain | None = None,
) -> SrbState:
    """Semi-implicit Euler at dt_control; swing feet follow their targets.

    With ``terrain``, swing feet cannot penetrate the ground (their target z
    is floored at the local surface height), so a foot that strikes a stair
    riser or up-slope early touches down there and is pinned for its next
    stance phase — the kinematic analog of early contact.
    """
    dt = mpc.dt_control
    f = forces.reshape(4, 3)
    stance = (swing_states == 0.0)[:, None]
    f = jnp.where(stance, f, 0.0)

    total_f = f.sum(axis=0)
    acc = total_f / robot.mass - jnp.array([0.0, 0.0, 1.0]) * mpc.gravity

    R = lie.quat_to_rotmat(state.quat)
    r_world = state.foot_pos - state.pos[None, :]
    torque_world = jnp.cross(r_world, f).sum(axis=0)
    I_world = R @ robot.inertia @ R.T
    omega_world = R @ state.omega_body
    # Euler's equation with gyroscopic term.
    domega_world = lie.solve3(
        I_world, torque_world - jnp.cross(omega_world, I_world @ omega_world)
    )
    omega_world = omega_world + dt * domega_world
    omega_body = R.T @ omega_world

    vel = state.vel + dt * acc
    pos = state.pos + dt * vel
    quat = lie.quat_integrate(state.quat, omega_body, dt)

    # Feet: pinned in stance (clamped to ground), target-following in swing.
    # Swing feet can never penetrate the surface — flat world included
    # (ground plane z = 0).  Without the clamp, a controller driven by an
    # over-estimated height plants feet below ground each cycle, which a
    # height-anchored estimator then re-levels, ratcheting the true base
    # downward — physically impossible on real ground.
    if terrain is not None:
        ground = terrain_lib.height_at(terrain, swing_pos_world[:, :2])
    else:
        ground = jnp.zeros((4,), jnp.float32)
    swing_pos_world = swing_pos_world.at[:, 2].set(
        jnp.maximum(swing_pos_world[:, 2], ground)
    )
    new_feet = jnp.where(stance, state.foot_pos, swing_pos_world)
    new_foot_vel = jnp.where(stance, 0.0, (new_feet - state.foot_pos) / dt)
    return SrbState(
        pos=pos, quat=quat, vel=vel, omega_body=omega_body,
        foot_pos=new_feet, foot_vel=new_foot_vel,
    )


def _diverged(state: SrbState) -> jnp.ndarray:
    """(B,) divergence flags: non-finite state or implausible base pose.

    The reference's only recovery mechanism is a periodic blanket sim reset
    (ref ``isaacgym_a1.py:174-177``, ``mujoco_aliengo.py:232-236``); here
    detection is per-scenario so one exploded rollout cannot poison a
    sweep's statistics (SURVEY.md §5.3).
    """
    finite = (
        jnp.all(jnp.isfinite(state.pos), axis=-1)
        & jnp.all(jnp.isfinite(state.vel), axis=-1)
        & jnp.all(jnp.isfinite(state.quat), axis=-1)
        & jnp.all(jnp.isfinite(state.omega_body), axis=-1)
        & jnp.all(jnp.isfinite(state.foot_pos), axis=(-1, -2))
        & jnp.all(jnp.isfinite(state.foot_vel), axis=(-1, -2))
    )
    rel_h = state.pos[:, 2] - jnp.mean(state.foot_pos[:, :, 2], axis=-1)
    plausible = (rel_h > 0.05) & (rel_h < 1.0) & (
        jnp.linalg.norm(state.vel, axis=-1) < 10.0
    )
    return ~(finite & plausible)


def init_full_carry(
    robot: RobotParams,
    mpc: MpcParams,
    init_state: SrbState,
    estimator: kf.KfParams | None = None,
):
    """The rollout's full internal loop carry at tick 0.

    Truth mode: the batched controller carry.  Estimator mode: the tuple
    ``(controller_carry, kf_state, held_forces)`` (held forces seed the
    synthesized accelerometer with standstill gravity support).  Production
    sweeps build this explicitly so the WHOLE loop state is a checkpointable
    pytree — resuming a killed sweep continues bitwise (SURVEY.md §5.4),
    unlike the reference whose controllers are unserializable live objects.
    """
    B = jnp.shape(robot.mass)[0]
    carry0 = jax.vmap(lambda _: ctrl.init_carry(mpc.horizon))(jnp.arange(B))
    if estimator is None:
        return carry0
    kf0 = jax.vmap(lambda s: kf.KfState.init(s.pos, s.foot_pos))(init_state)
    w0 = robot.mass * mpc.gravity / 4.0
    forces0 = jnp.zeros((B, 12), jnp.float32).at[:, 2::3].set(w0[:, None])
    return (carry0, kf0, forces0)


def rollout(
    robot: RobotParams,
    mpc: MpcParams,
    gait: GaitParams,
    cmd: Command,
    num_ticks: int,
    init_state: SrbState | None = None,
    solver: str = ctrl.DEFAULT_SOLVER,
    terrain: terrain_lib.Terrain | None = None,
    auto_reset: bool = True,
    estimator: kf.KfParams | None = None,
    sensor_noise: SensorNoise | None = None,
    key=None,
    carry_in=None,
    tick0=0,
    return_full_carry: bool = False,
    cmd_ramp_ticks: int | None = None,
    contact_source: str = "plan",
    solver_cfg=None,
):
    """Closed-loop batched rollout under ``lax.scan``.

    ``solver_cfg``: optional dict of solver-config kwargs forwarded to
    :func:`controller.step_batch` (e.g. ``{"riccati_cfg": ...}``) to
    override a solver's in-loop preset for a whole rollout.

    Every pytree argument except ``mpc`` carries a leading scenario batch
    axis (``robot``, ``gait``, ``cmd``, and optional ``terrain`` are
    randomization axes).  Returns ``((env_state, controller_carry), metrics)``
    where metrics holds per-tick (B,)-shaped tracking diagnostics, including
    ``diverged`` flags; with ``auto_reset`` a diverged scenario snaps back to
    its initial state (controller carry included) instead of poisoning the
    remaining ticks.

    With ``estimator`` the controller is driven by the two-stage Kalman
    filter (BASELINE config 2) instead of ground truth: each tick
    synthesizes noisy IMU/encoder readings (:func:`synthesize_sensors`),
    runs :func:`pympc_quadruped_tpu.estimation.kf.update` gated by foot
    contact, and feeds the controller the estimate.  Metrics then include
    per-tick estimator position/velocity errors.

    ``contact_source`` picks the KF's leg-odometry gate: ``"plan"`` (default
    for this kinematic env — feet ARE pinned exactly on the gait schedule)
    uses the planned stance; ``"measured"`` synthesizes a touch signal from
    the currently-held GRFs (normal force > 1 N — what a foot force sensor
    reads in this world, the robust gating of the full-order env and the
    MuJoCo harness, ref touch sensors ``robot/aliengo/aliengo.xml:244-260``).
    The two DISAGREE transiently: held forces lag the schedule by up to one
    solve period (20 ticks) at every stance transition, so "measured" mode
    exercises exactly the schedule-slip robustness the plan gate cannot.
    With it, metrics carry ``contact_mismatch`` (mean |measured - plan| over
    legs per tick).

    Chunked sweeps resume exactly: pass the previous chunk's env state as
    ``init_state``, its full carry (:func:`init_full_carry` structure) as
    ``carry_in``, and the absolute starting tick as ``tick0`` — gait phase
    and sensor-noise streams are functions of the absolute tick, so a
    killed-and-restored sweep continues bitwise.  ``return_full_carry``
    returns the whole carry instead of just the controller part.
    """
    B = jnp.shape(robot.mass)[0]
    if init_state is None:
        if terrain is not None:
            init_state = jax.vmap(init_state_on_terrain)(robot, terrain)
        else:
            init_state = jax.vmap(default_init_state)(robot)
    use_kf = estimator is not None
    if use_kf:
        if sensor_noise is None:
            sensor_noise = SensorNoise.default()
        if key is None:
            key = jax.random.PRNGKey(0)
    carry0 = init_full_carry(robot, mpc, init_state, estimator)
    start_carry = carry0 if carry_in is None else carry_in

    def tick_fn(carry, tick):
        if use_kf:
            env_state, (c_carry, kf_state, held_forces) = carry
            sensors = jax.vmap(
                lambda r, s, f, k: synthesize_sensors(r, s, f, k, sensor_noise)
            )(
                robot, env_state, held_forces,
                jax.random.split(jax.random.fold_in(key, tick), B),
            )
            plan_contact = jax.vmap(
                lambda g: (gaitsched.swing_state(g, mpc, tick) == 0.0).astype(
                    jnp.float32
                )
            )(gait)
            if contact_source == "measured":
                # A touch sensor reads the force the foot actually carries:
                # in this kinematic world that is the held GRF on a PINNED
                # (plan-stance) foot — an airborne foot cannot fire it.  The
                # gate therefore lags the plan at every stance ONSET (the
                # held solve predates the transition, so fz is still ~0 for
                # up to one solve period): late-touchdown detection, the
                # schedule-slip case the plan gate never exercises.
                held_fz = held_forces.reshape(B, 4, 3)[:, :, 2]
                contact = plan_contact * (held_fz > 1.0).astype(jnp.float32)
            else:
                contact = plan_contact
            kf_state = jax.vmap(
                lambda st, r, sn, c: kf.update(
                    st, r, sn.gyro, sn.accel, sn.q, sn.qdot, c, estimator
                )
            )(kf_state, robot, sensors, contact)
            obs = jax.vmap(kf.to_obs)(kf_state, sensors.gyro, sensors.q, sensors.qdot)
        else:
            env_state, c_carry = carry
            obs = jax.vmap(observe)(robot, env_state)
        cmd_eff = (
            cmd if cmd_ramp_ticks is None else cmd.ramped(tick, cmd_ramp_ticks)
        )
        c_carry, out = ctrl.step_batch(
            robot, mpc, gait, cmd_eff, c_carry, obs, tick, solver=solver,
            **(solver_cfg or {}),
        )
        # World-frame swing-foot desired positions from the base-frame targets.
        swing_pos_world = env_state.pos[:, None, :] + jnp.einsum(
            "bij,blj->bli", out.kin.R_base, out.pos_targets
        )
        if terrain is not None:
            env_state = jax.vmap(
                lambda r, s, f, ss, sp, t: physics_step(r, mpc, s, f, ss, sp, t)
            )(robot, env_state, out.contact_forces, out.swing_states,
              swing_pos_world, terrain)
        else:
            env_state = jax.vmap(
                lambda r, s, f, ss, sp: physics_step(r, mpc, s, f, ss, sp)
            )(robot, env_state, out.contact_forces, out.swing_states,
              swing_pos_world)

        bad = _diverged(env_state)
        pick = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(
                bad.reshape((B,) + (1,) * (x.ndim - 1)), x, y
            ),
            a, b,
        )
        if use_kf:
            new_carry = (c_carry, kf_state, out.contact_forces)
            if auto_reset:
                env_state = pick(init_state, env_state)
                new_carry = pick(carry0, new_carry)
        else:
            new_carry = c_carry
            if auto_reset:
                env_state = pick(init_state, env_state)
                new_carry = pick(carry0, new_carry)

        vel_des_world = jnp.einsum(
            "bij,bj->bi", out.kin.R_base, cmd_eff.vel_base_des
        )
        metrics = {
            "vel_err": jnp.linalg.norm(env_state.vel - vel_des_world, axis=-1),
            "height": env_state.pos[:, 2],
            "upright": out.kin.R_base[:, 2, 2],
            "diverged": bad,
        }
        if use_kf:
            est = new_carry[1]
            metrics["est_pos_err"] = jnp.linalg.norm(
                est.x[:, 0:3] - env_state.pos, axis=-1
            )
            metrics["est_vel_err"] = jnp.linalg.norm(
                est.x[:, 3:6] - env_state.vel, axis=-1
            )
            if contact_source == "measured":
                metrics["contact_mismatch"] = jnp.mean(
                    jnp.abs(contact - plan_contact), axis=-1
                )
        return (env_state, new_carry), metrics

    ticks = jnp.int32(tick0) + jnp.arange(num_ticks, dtype=jnp.int32)
    (env_state, final_carry), metrics = jax.lax.scan(
        tick_fn, (init_state, start_carry), ticks
    )
    if return_full_carry:
        return (env_state, final_carry), metrics
    c_carry = final_carry[0] if use_kf else final_carry
    return (env_state, c_carry), metrics
