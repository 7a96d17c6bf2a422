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

    def ramped(self, tick, ramp_ticks) -> "Command":
        """The command scaled by ``min(1, tick/ramp_ticks)`` — a linear
        spin-up from standstill, what a joystick operator does on hardware.

        The reference steps its hard-coded command instantly; both rollout
        envs keep that default.  Measured (r3, full-order env): every trot
        speed 0.6-1.4 m/s is stable in steady state, but the standstill
        STEP transient is knife-edge (1.2 m/s dips to upright 0.86; exactly
        1.0 m/s tips over), while ramped — or stepped from a walking state
        — the same speeds hold upright_min > 0.99.
        """
        ramp = jnp.float32(ramp_ticks)
        # ramp_ticks <= 0 means "no ramp" (scale 1), not a 0/0 NaN at tick 0;
        # the safe divisor keeps the untaken branch NaN-free, so a fractional
        # ramp in (0, 1) still scales by tick/ramp rather than tick/1.
        safe_ramp = jnp.where(ramp > 0.0, ramp, 1.0)
        s = jnp.where(
            ramp > 0.0,
            jnp.clip(jnp.asarray(tick, jnp.float32) / safe_ramp, 0.0, 1.0),
            1.0,
        )
        return Command(
            vel_base_des=self.vel_base_des * s,
            yaw_turn_rate=self.yaw_turn_rate * s,
        )
