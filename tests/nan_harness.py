#!/usr/bin/env python
"""NaN-debug harness (SURVEY.md §5.2): run the hot paths under
``jax_debug_nans`` so any silent NaN in the production pipeline raises at the
op that produced it.

Run standalone (CI step) or via tests/test_nan_harness.py, which executes it
in a subprocess — the flag is global and would trip on the suite's
*intentional* NaN fault-injection tests otherwise.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=2 --xla_backend_optimization_level=0",
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import a1, aliengo
    from pympc_quadruped_tpu.env import srb_env
    from pympc_quadruped_tpu.estimation import kf

    B = 2
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )

    # Closed-loop SRB rollout on the production solver (fast ADMM + warm
    # start), ground-truth obs, 3 solve periods.
    for robot_fn in (aliengo, a1):
        (state, _), metrics = srb_env.rollout(
            tile(robot_fn()), mpc, tile(Gaits.trotting10()),
            tile(Command.trot_forward(0.8)), num_ticks=60, auto_reset=False,
        )
        jax.block_until_ready(metrics)

    # KF-in-the-loop variant (sensor synthesis + estimator + controller).
    (state, _), metrics = srb_env.rollout(
        tile(aliengo()), mpc, tile(Gaits.trotting10()),
        tile(Command.trot_forward(0.8)), num_ticks=60,
        estimator=kf.KfParams.default(), key=jax.random.PRNGKey(0),
        auto_reset=False,
    )
    jax.block_until_ready(metrics)
    print("nan harness OK: no NaNs produced on the hot paths")


if __name__ == "__main__":
    main()
