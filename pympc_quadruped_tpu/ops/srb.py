"""Single-rigid-body (SRB) state-space model + exact ZOH discretization.

State (13): x = [roll, pitch, yaw, px, py, pz, wx, wy, wz, vx, vy, vz, g]
Input (12): u = [f_FL, f_FR, f_RL, f_RR] ground-reaction forces, world frame.

Continuous dynamics linearized about the current yaw and footholds
(ref ``linear_mpc/mpc.py:173-192``, derivation ``doc/linear_mpc.md:177-257``):

    theta_dot = Rz(yaw)^T omega
    p_dot     = v
    omega_dot = (Rz I Rz^T)^{-1} sum_i [r_i]x f_i
    v_dot     = sum_i f_i / m + g e_z         (g carried as the 13th state)

Discretization: the reference builds the 25x25 block matrix
[[Ac, Bc], [0, 0]] * dt and calls scipy ``expm`` (ref mpc.py:194-208) —
twice, discarding the first result (ref mpc.py:267-268; fixed here).  On TPU
we exploit structure instead: ``Ac`` is nilpotent with Ac^3 = 0 (the only
chains are theta<-omega, p<-v, and vz<-g), so the exponential series
terminates exactly:

    Ad = I + Ac dt + Ac^2 dt^2 / 2
    Bd = (I dt + Ac dt^2/2 + Ac^2 dt^3/6) Bc

This is *exact* (not an approximation of expm), is ~50x less work than a
25x25 Pade expm, and is fully batchable.  ``tests/test_srb.py`` checks it
against ``scipy.linalg.expm`` to float32 precision.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import NUM_INPUT, NUM_STATE, MpcParams
from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.ops import lie


def state_space(
    robot: RobotParams,
    yaw: jnp.ndarray,
    pos_base_feet: jnp.ndarray,
):
    """Continuous-time (Ac, Bc) for the current yaw and world-frame foot offsets.

    Args:
      yaw: scalar base yaw.
      pos_base_feet: (4,3) foot positions relative to the base, world frame
        (the reference's ``r_i``, ref mpc.py:79,189).

    Returns:
      Ac (13,13), Bc (13,12), float32.
    """
    Rz = lie.rot_z(yaw)
    inertia_world = Rz @ robot.inertia @ Rz.T
    # NOTE: kept as linalg.inv deliberately. lie.inv3 here is ~1e-7 different
    # and the full-order closed-loop trots are sensitive enough that stumble
    # timing moves (r3 measured); this inverse runs once per SOLVE (not per
    # tick), so the adjugate's savings are immaterial anyway — the per-tick
    # hot path uses lie.solve3 (env/srb_env.py).
    inv_inertia = jnp.linalg.inv(inertia_world)

    # Assemble by block concatenation (pure data movement — bit-identical
    # to the scatter form, but far fewer ops under vmap: each .at[].set
    # lowered to a full-size dynamic-update-slice per scenario).
    f32 = jnp.float32
    z = lambda r, c: jnp.zeros((r, c), f32)
    rows_theta = jnp.concatenate([z(3, 6), Rz.T, z(3, 4)], axis=1)
    rows_pos = jnp.concatenate([z(3, 9), jnp.eye(3, dtype=f32), z(3, 1)], axis=1)
    row_vz = jnp.zeros((1, NUM_STATE), f32).at[0, 12].set(1.0)
    Ac = jnp.concatenate(
        [rows_theta, rows_pos, z(5, NUM_STATE), row_vz, z(1, NUM_STATE)],
        axis=0,
    )

    # (4,3,3) torque maps -> block rows of the 13x12 input matrix.
    skews = jax.vmap(lie.skew)(pos_base_feet)                      # (4,3,3)
    torque_blocks = jnp.einsum("ij,ljk->lik", inv_inertia, skews)  # (4,3,3)
    force_blocks = jnp.broadcast_to(
        jnp.eye(3, dtype=f32) / robot.mass, (4, 3, 3)
    )
    # (4,3,3) -> (3,12): transpose leg axis next to columns, then reshape.
    Bc_omega = jnp.transpose(torque_blocks, (1, 0, 2)).reshape(3, NUM_INPUT)
    Bc_vel = jnp.transpose(force_blocks, (1, 0, 2)).reshape(3, NUM_INPUT)
    Bc = jnp.concatenate(
        [z(6, NUM_INPUT), Bc_omega, Bc_vel, z(1, NUM_INPUT)], axis=0
    )
    return Ac, Bc


def discretize(Ac: jnp.ndarray, Bc: jnp.ndarray, dt: jnp.ndarray):
    """Exact ZOH discretization using the terminating nilpotent series."""
    eye = jnp.eye(NUM_STATE, dtype=Ac.dtype)
    A2 = Ac @ Ac
    Ad = eye + Ac * dt + A2 * (0.5 * dt * dt)
    Bd = (eye * dt + Ac * (0.5 * dt * dt) + A2 * (dt * dt * dt / 6.0)) @ Bc
    return Ad, Bd


def pack_state(
    rpy: jnp.ndarray,
    pos: jnp.ndarray,
    omega: jnp.ndarray,
    vel: jnp.ndarray,
    mpc: MpcParams,
) -> jnp.ndarray:
    """(13,) MPC state; x[12] = -g (ref mpc.py:55-77, the NOTE at :75)."""
    g_slot = jnp.reshape(-mpc.gravity, (1,)).astype(jnp.float32)
    return jnp.concatenate([rpy, pos, omega, vel, g_slot])
