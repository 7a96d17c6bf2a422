"""Ground-adaptive height mode (``MpcParams.ground_adaptive_height``).

The reference's height handling is flat-world absolute: X_ref's z row is the
constant ``body_height`` (ref ``linear_mpc/mpc.py:160``), the swing apex is
world z = 0.1 and the touchdown target world z = -0.0255
(ref ``swing_foot_trajectory_generator.py:120``).  On elevated terrain this
commands the robot meters downward; its dead PCA terrain-estimation code
(ref ``utils/robot_data.py:194-228``, never called) shows the adaptation was
intended but never built.  The adaptive mode estimates the local ground from
stance-foot leg odometry (no terrain oracle) and references height, apex and
touchdown to it.

Measured (this file's closed-loop gate): on 6 cm / 0.30 m stairs at 0.5 m/s
the blind mode flips within a second (upright -0.93, x -7.3 m); the adaptive
mode climbs (x +1.1 m over 2.5 s, upright 0.99, vel_err 0.03).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.control import refmpc
from pympc_quadruped_tpu.env import fullorder, terrain as terrain_lib


def _tile(t, B):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t)


def test_reference_height_row_shifts_by_ground_only_when_enabled():
    """Flag off: ground_z is ignored bitwise.  Flag on: the z row (and only
    the z row) shifts by exactly ground_z."""
    robot = aliengo()
    cmd = Command.trot_forward(0.5)
    x_t = jnp.zeros((13,), jnp.float32).at[5].set(0.38).at[12].set(-9.81)
    gz = jnp.float32(1.98)

    def xref(mpc, ground_z):
        carry = refmpc.MpcCarry.init(mpc.horizon)
        carry, vel = refmpc.integrate_desired(
            carry, _fake_kin(), cmd, mpc
        )
        _, X = refmpc.reference_trajectory(
            carry, x_t, vel, cmd, mpc, robot, None, ground_z=ground_z
        )
        return np.asarray(X)

    off = MpcParams(horizon=10)
    on = MpcParams(horizon=10, ground_adaptive_height=True)
    np.testing.assert_array_equal(xref(off, gz), xref(off, jnp.float32(0.0)))
    d = xref(on, gz) - xref(on, jnp.float32(0.0))
    np.testing.assert_allclose(d[:, 5], 1.98, rtol=1e-6)
    d_others = np.delete(d, 5, axis=1)
    np.testing.assert_array_equal(d_others, 0.0)


def _fake_kin():
    from pympc_quadruped_tpu.ops.kin import KinState

    eye = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros((3,), jnp.float32)
    z43 = jnp.zeros((4, 3), jnp.float32)
    return KinState(
        R_base=eye, rpy_base=z3, pos_base=z3.at[2].set(0.38),
        lin_vel_base=z3, ang_vel_base=z3, base_pos_base_feet=z43,
        pos_base_feet=z43, pos_feet=z43, base_vel_base_feet=z43,
        base_pos_base_thighs=z43, jac_feet=jnp.zeros((4, 3, 3), jnp.float32),
    )


def test_stairs_climb_adaptive():
    """Closed-loop: Aliengo trots UP 6 cm stairs (start mid-staircase at
    ~2 m elevation) with the adaptive mode — the configuration where the
    blind reference semantics flip the robot immediately."""
    B = 2
    mpc = MpcParams(horizon=10, ground_adaptive_height=True)
    robot = _tile(aliengo(), B)
    gait = _tile(Gaits.trotting10(), B)
    cmd = _tile(Command.trot_forward(0.5), B)
    terr = _tile(terrain_lib.stairs(0.30, 0.06), B)
    state0 = jax.vmap(fullorder.init_state_on_terrain)(robot, terr)
    z0 = np.asarray(state0.pos[:, 2]).copy()
    (state, _), m = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=2000, terrain=terr,
        state0=state0, cmd_ramp_ticks=400,
    )
    up = np.asarray(m["upright"])[-500:].min(axis=0)
    x = np.asarray(state.pos[:, 0])
    dz = np.asarray(state.pos[:, 2]) - z0
    assert (up > 0.9).all(), up
    assert (x > 0.5).all(), x          # forward progress up the staircase
    assert (dz > 0.08).all(), dz       # climbed at least ~1.5 steps
    assert not np.asarray(m["diverged"]).any()
