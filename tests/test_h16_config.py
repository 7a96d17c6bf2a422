"""The reference's DEFAULT configuration: horizon 16 + TROTTING16.

BASELINE pins horizon 10 (TROTTING10) as the benchmark config, but the
reference ships ``horizon = 16`` as its config default
(ref ``config/linear_mpc_configs.py:11``) with the TROTTING16 table — a
192-variable / 320-row QP (ref ``linear_mpc/mpc.py:232,246``).  This test
closes the loop at that size (the fused TPU kernel pads 192 -> 256 and was
parity-checked on-chip in r3: cost excess -2.1e-6 vs the jnp path).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.env import srb_env


def test_h16_trotting16_closed_loop():
    mpc = MpcParams(horizon=16)
    B = 2
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting16())
    cmd = tile(Command.trot_forward(1.2))
    (state, _), metrics = srb_env.rollout(
        robot, mpc, gait, cmd, num_ticks=3000, auto_reset=False
    )
    assert not np.asarray(metrics["diverged"]).any()
    assert np.asarray(metrics["vel_err"])[-750:].mean() < 0.15
    assert 0.34 < np.asarray(metrics["height"])[-1].mean() < 0.42
    assert float(state.pos[0, 0]) > 2.0
