"""Swing-foot trajectory generation — pure, vectorized over all four legs.

The reference instantiates one stateful generator per leg and evaluates a
Drake ``PiecewisePolynomial.CubicHermite`` spline per call (ref
``linear_mpc/swing_foot_trajectory_generator.py:15-129``).  Here the spline
is closed-form (two cubic Hermite segments with zero knot velocities need no
polynomial object) and the per-leg latches live in an explicit carry pytree,
updated with ``where`` masks so all four legs advance in one fused step.

Reproduced semantics (all per reference):

- Raibert-style foothold: yaw-corrected thigh projection + command feed
  forward over the remaining swing + 1/2-stance drift + 0.03 velocity
  feedback + centripetal yaw term (ref :111-119);
- planned touchdown height is the constant ``robot.touchdown_z`` = -0.0255 m
  (ref :120);
- ``remaining_swing_time`` initializes to the full swing duration on the
  first call of each swing and decrements by dt_control on subsequent calls
  (ref :105-108); the first call also latches the lift-off foot position
  (ref :124-126); a call with swing_state >= 1 re-arms the latch (ref :128-129);
- latches only advance for legs whose swing_state > 0 — the application loop
  only calls the generator for swinging legs (ref scripts/mujoco_aliengo.py:213).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import GaitParams
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.ops import gaitsched, lie
from pympc_quadruped_tpu.ops.kin import KinState


@struct.dataclass
class SwingCarry:
    """Per-leg swing latches (all shape (4,) / (4,3))."""

    is_first_swing: jnp.ndarray        # bool (4,)
    remaining_swing_time: jnp.ndarray  # (4,)
    footpos_init: jnp.ndarray          # (4,3) world
    footpos_final: jnp.ndarray         # (4,3) world

    @staticmethod
    def init() -> "SwingCarry":
        return SwingCarry(
            is_first_swing=jnp.ones((4,), dtype=bool),
            remaining_swing_time=jnp.zeros((4,), jnp.float32),
            footpos_init=jnp.zeros((4, 3), jnp.float32),
            footpos_final=jnp.zeros((4, 3), jnp.float32),
        )


def _hermite_eval(p0, p1, duration, t):
    """Cubic Hermite segment with zero endpoint velocities, elementwise over legs.

    p0, p1: (4,3); duration, t: scalars or (4,).  Returns (pos, vel)."""
    u = jnp.clip(t / duration, 0.0, 1.0)
    blend = u * u * (3.0 - 2.0 * u)
    dblend = 6.0 * u * (1.0 - u) / duration
    diff = p1 - p0
    return p0 + blend[..., None] * diff, dblend[..., None] * diff


def update_swing(
    robot: RobotParams,
    mpc: MpcParams,
    gait: GaitParams,
    cmd: Command,
    kin: KinState,
    carry: SwingCarry,
    swing_states: jnp.ndarray,
):
    """Advance all four legs one tick.

    Returns (carry', pos_targets (4,3), vel_targets (4,3)) — targets are
    relative to the base, in the base frame, and zero for stance legs
    (matching the zero-initialized target arrays in the reference app loop,
    ref scripts/mujoco_aliengo.py:209-222).
    """
    active = swing_states > 0.0                      # legs being updated
    t_stance = gaitsched.stance_time(gait, mpc)
    t_swing = gaitsched.swing_time(gait, mpc)
    R = kin.R_base
    vel_des_world = R @ cmd.vel_base_des

    # --- placement (ref :84-129) ---
    remaining = jnp.where(
        carry.is_first_swing,
        t_swing,
        carry.remaining_swing_time - mpc.dt_control,
    )
    remaining = jnp.where(active, remaining, carry.remaining_swing_time)

    rot_yaw = lie.rot_z(cmd.yaw_turn_rate * 0.5 * t_stance)
    thigh_corr = kin.base_pos_base_thighs @ rot_yaw.T            # (4,3)

    foothold = (
        kin.pos_base[None, :]
        + (thigh_corr + cmd.vel_base_des[None, :] * remaining[:, None]) @ R.T
        + 0.5 * t_stance * kin.lin_vel_base[None, :]
        + 0.03 * (kin.lin_vel_base - vel_des_world)[None, :]
    )
    centripetal = (0.5 * kin.pos_base[2] / mpc.gravity) * jnp.stack(
        [
            kin.lin_vel_base[1] * cmd.yaw_turn_rate,
            -kin.lin_vel_base[0] * cmd.yaw_turn_rate,
            jnp.zeros_like(cmd.yaw_turn_rate),
        ]
    )
    foothold = foothold + centripetal[None, :]

    footpos_init = jnp.where(
        (active & carry.is_first_swing)[:, None], kin.pos_feet, carry.footpos_init
    )
    if mpc.ground_adaptive_height:
        # Per-leg local ground sample = that leg's own lift-off foot height
        # (leg odometry; latched above).  Touchdown keeps the reference's
        # -0.0255 m press-in offset but measured from the local ground, not
        # from world zero (ref swing_foot_trajectory_generator.py:120 is
        # absolute — on a 2 m staircase it commands the foot 2 m down).
        foothold = foothold.at[:, 2].set(
            footpos_init[:, 2] + robot.touchdown_z
        )
    else:
        foothold = foothold.at[:, 2].set(robot.touchdown_z)

    footpos_final = jnp.where(active[:, None], foothold, carry.footpos_final)
    # First-call latch clears; completing a swing (state >= 1) re-arms it.
    is_first = jnp.where(active, False, carry.is_first_swing)
    is_first = jnp.where(active & (swing_states >= 1.0), True, is_first)

    # --- trajectory evaluation (ref :38-82) ---
    cur_t = t_swing - remaining
    half = t_swing * 0.5
    mid = 0.5 * (footpos_init + footpos_final)
    if mpc.ground_adaptive_height:
        # Apex clearance above the HIGHER of lift-off/touchdown ground
        # samples (the absolute form drags swing feet to world z = 0.1 on
        # elevated terrain).
        mid = mid.at[:, 2].set(
            jnp.maximum(footpos_init[:, 2], footpos_final[:, 2])
            + robot.swing_height
        )
    else:
        mid = mid.at[:, 2].set(robot.swing_height)
    p_a, v_a = _hermite_eval(footpos_init, mid, half, cur_t)
    p_b, v_b = _hermite_eval(mid, footpos_final, half, cur_t - half)
    in_first = (cur_t < half)[:, None]
    pos_world = jnp.where(in_first, p_a, p_b)
    vel_world = jnp.where(in_first, v_a, v_b)

    pos_rel_base = (pos_world - kin.pos_base[None, :]) @ R      # R^T @ (p - p_base)
    vel_rel_base = (vel_world - kin.lin_vel_base[None, :]) @ R

    pos_targets = jnp.where(active[:, None], pos_rel_base, 0.0)
    vel_targets = jnp.where(active[:, None], vel_rel_base, 0.0)

    new_carry = SwingCarry(
        is_first_swing=is_first,
        remaining_swing_time=remaining,
        footpos_init=footpos_init,
        footpos_final=footpos_final,
    )
    return new_carry, pos_targets, vel_targets
