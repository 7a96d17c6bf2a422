"""Controller integration smoke tests: closed loop on the SRB environment.

The full-order behavioral test lives in ``examples/mujoco_closed_loop.py``
(CPU, slow); here the on-device SRB env closes the loop — if the controller
semantics are right, the trunk tracks the commanded velocity and holds its
height (the MPC's own model class, so tracking should be tight).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.env import srb_env
from pympc_quadruped_tpu.parallel import sweep


@pytest.fixture(scope="module")
def standing_rollout():
    mpc = MpcParams(horizon=10)
    robot_b, gait_b, cmd_b = sweep.make_scenario_batch(
        aliengo(),
        Gaits.standing(),
        Command(
            vel_base_des=jnp.zeros(3, jnp.float32), yaw_turn_rate=jnp.float32(0.0)
        ),
        batch=2,
    )
    # standing() has num_segments=16 but horizon 10 is fine (table all ones).
    (state, carry), metrics = srb_env.rollout(robot_b, mpc, gait_b, cmd_b, num_ticks=400)
    return state, metrics


def test_standing_holds_height(standing_rollout):
    state, metrics = standing_rollout
    height = np.asarray(state.pos[:, 2])
    np.testing.assert_allclose(height, 0.38, atol=0.05)
    assert np.all(np.isfinite(np.asarray(state.vel)))


def test_standing_forces_support_weight(standing_rollout):
    state, metrics = standing_rollout
    # Near-static equilibrium: velocity should be small after 0.4 s.
    vel = np.asarray(state.vel)
    assert np.all(np.abs(vel) < 0.2), vel


def test_trot_tracks_velocity():
    mpc = MpcParams(horizon=10)
    robot_b, gait_b, cmd_b = sweep.make_scenario_batch(
        aliengo(), Gaits.trotting10(), Command.trot_forward(0.6), batch=2
    )
    (state, carry), metrics = srb_env.rollout(
        robot_b, mpc, gait_b, cmd_b, num_ticks=1200
    )
    # After 1.2 s the SRB should be moving forward near the command and
    # holding height; tolerances generous (kinematic swing feet).
    vel = np.asarray(state.vel)
    height = np.asarray(state.pos[:, 2])
    assert np.all(np.isfinite(vel))
    assert np.all(vel[:, 0] > 0.25), f"vx={vel[:, 0]}"
    assert np.all(np.abs(height - 0.38) < 0.08), f"height={height}"
