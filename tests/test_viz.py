"""Headless visualization smoke tests (utils/viz.py).

The reference treats its viewer GIF as the published result and has a
matplotlib predicted-CoM debug plot (ref mpc.py:293-318); these verify the
framework's display-less equivalents produce real artifacts.
"""
import os

import numpy as np

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.env import srb_env
from pympc_quadruped_tpu.utils import viz


def test_gait_diagram_and_rollout_plot(tmp_path):
    mpc = MpcParams(horizon=10)
    gait = Gaits.trotting10()
    p1 = viz.gait_diagram(gait, mpc, 800, str(tmp_path / "gait.png"))
    assert os.path.getsize(p1) > 2000

    B = 2
    tile = lambda t: jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t)
    _, metrics = srb_env.rollout(
        tile(aliengo()), mpc, tile(gait), tile(Command.trot_forward(0.6)),
        num_ticks=120,
    )
    p2 = viz.plot_rollout_metrics(metrics, str(tmp_path / "rollout.png"))
    assert os.path.getsize(p2) > 2000


def test_predicted_com_plot(tmp_path):
    mpc = MpcParams(horizon=10)
    robot = aliengo()
    x_t = jnp.zeros(13, jnp.float32).at[5].set(0.38).at[12].set(-9.81)
    feet = jnp.array(
        [[0.24, 0.13, -0.38], [0.24, -0.13, -0.38],
         [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]], jnp.float32,
    )
    X_ref = jnp.zeros((10, 13), jnp.float32).at[:, 5].set(0.38).at[:, 12].set(-9.81)
    U = jnp.zeros(120, jnp.float32)
    p = viz.plot_predicted_com(
        robot, mpc, x_t, 0.0, feet, X_ref.reshape(-1), U, str(tmp_path / "com.png")
    )
    assert os.path.getsize(p) > 2000


def test_animate_trot_gif(tmp_path):
    T = 30
    t = np.linspace(0, 0.6, T)
    trace = {
        "obs_pos": np.stack([0.5 * t, 0 * t, 0.38 + 0.01 * np.sin(8 * t)], axis=1),
        "obs_quat": np.tile([1.0, 0, 0, 0], (T, 1)),
        "obs_q": np.tile(np.tile([0.0, 0.8, -1.6], 4), (T, 1))
        + 0.1 * np.sin(10 * t)[:, None],
    }
    p = viz.animate_trot(trace, aliengo(), str(tmp_path / "trot.gif"), stride=2)
    assert os.path.getsize(p) > 10000
