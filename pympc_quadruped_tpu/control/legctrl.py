"""Leg torque mapping: world-frame forces -> 12 joint torques.

The reference iterates a Python loop over legs, multiplying each 3x18
Pinocchio Jacobian transpose and slicing out the leg's joint block
(ref ``linear_mpc/leg_controller.py:70-91``).  The joint columns of that
world-aligned Jacobian are exactly ``R_base @ J_leg`` with ``J_leg`` the
base-frame closed-form leg Jacobian, so per leg:

    tau_leg = J_leg^T R_base^T F_world

- stance legs:  F_world = -f_mpc           (ref :88-90)
- swing legs:   F_world = Kp (R p_des - R p) + Kd (R v_des - R v)  (ref :78-86)

A leg counts as swinging iff its swing_state is nonzero — the reference
branches on the float's truthiness (ref :78).  Everything is one fused
einsum over the four legs.
"""
from __future__ import annotations

import jax.numpy as jnp

from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.ops.kin import KinState


def leg_torques(
    robot: RobotParams,
    kin: KinState,
    contact_forces: jnp.ndarray,
    swing_states: jnp.ndarray,
    pos_targets_swingfeet: jnp.ndarray,
    vel_targets_swingfeet: jnp.ndarray,
) -> jnp.ndarray:
    """Compute the (12,) torque command.

    Args:
      contact_forces: (12,) world-frame GRFs from the MPC.
      swing_states: (4,) normalized swing phases (0 = stance).
      pos/vel_targets_swingfeet: (4,3) base-frame swing targets.
    """
    R = kin.R_base
    swinging = (swing_states != 0.0)[:, None]

    # World-frame Cartesian PD for swing legs (gains are diagonal).
    pos_err_w = (pos_targets_swingfeet - kin.base_pos_base_feet) @ R.T
    vel_err_w = (vel_targets_swingfeet - kin.base_vel_base_feet) @ R.T
    f_swing = robot.kp_swing[None, :] * pos_err_w + robot.kd_swing[None, :] * vel_err_w

    f_stance = -contact_forces.reshape(4, 3)
    f_world = jnp.where(swinging, f_swing, f_stance)

    # tau_leg = J_leg^T (R^T F_world), fused over legs.
    f_base = f_world @ R
    tau = jnp.einsum("lij,li->lj", kin.jac_feet, f_base)
    return tau.reshape(12)
