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

    Ac = jnp.zeros((NUM_STATE, NUM_STATE), dtype=jnp.float32)
    Ac = Ac.at[0:3, 6:9].set(Rz.T)
    Ac = Ac.at[3:6, 9:12].set(jnp.eye(3, dtype=jnp.float32))
    Ac = Ac.at[11, 12].set(1.0)

    # (4,3,3) torque maps, then scatter into the 13x12 input matrix.
    skews = jnp.stack([lie.skew(pos_base_feet[i]) for i in range(4)])
    torque_blocks = jnp.einsum("ij,ljk->lik", inv_inertia, skews)  # (4,3,3)
    force_blocks = jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.float32) / robot.mass, (4, 3, 3)
    )

    # Rows 6:9 <- torque blocks, rows 9:12 <- force blocks, columns 3l:3l+3.
    Bc_omega = jnp.concatenate([torque_blocks[i] for i in range(4)], axis=1)
    Bc_vel = jnp.concatenate([force_blocks[i] for i in range(4)], axis=1)
    Bc = jnp.zeros((NUM_STATE, NUM_INPUT), dtype=jnp.float32)
    Bc = Bc.at[6:9, :].set(Bc_omega)
    Bc = Bc.at[9:12, :].set(Bc_vel)
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
