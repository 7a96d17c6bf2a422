"""Velocity command pytree.

The reference left ``config/cmd.py`` empty and hard-coded commands in its
scripts (ref ``scripts/mujoco_aliengo.py:179-180``, ``scripts/isaacgym_a1.py:98``).
Here the command is a first-class pytree so a command sweep is a batch axis.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Command:
    """Desired base velocity in the base frame + yaw turn rate [rad/s]."""

    vel_base_des: jnp.ndarray  # (3,) m/s, base frame
    yaw_turn_rate: jnp.ndarray  # scalar rad/s

    @staticmethod
    def trot_forward(vx: float = 1.2) -> "Command":
        return Command(
            vel_base_des=jnp.array([vx, 0.0, 0.0], dtype=jnp.float32),
            yaw_turn_rate=jnp.float32(0.0),
        )
