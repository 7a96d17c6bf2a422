#!/usr/bin/env python
"""Record a short trot and render all visual artifacts (headless).

Produces, under --out (default ./viz_out):
    trot.gif          stick-figure animation of the MuJoCo trot
    gait.png          TROTTING10 stance/swing diagram
    rollout.png       batched SRB sweep metric curves
    predicted_com.png the reference's predicted-CoM debug plot analog

Usage:  JAX_PLATFORMS=cpu python examples/visualize.py --seconds 2
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="viz_out")
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--robot", default="aliengo")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from mujoco_closed_loop import run
    from pympc_quadruped_tpu import engine
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import a1, aliengo
    from pympc_quadruped_tpu.env import srb_env
    from pympc_quadruped_tpu.ops import gaitsched
    from pympc_quadruped_tpu.utils import viz

    robot1 = aliengo() if args.robot == "aliengo" else a1()
    mpc = MpcParams(horizon=10)
    gait = Gaits.trotting10()

    # 1. Record a trot + animate it (stick figure) + render it (MuJoCo
    # offscreen — the publishable artifact matching the reference's
    # doc/results/trotting10_mujoco.gif).
    trace_path = os.path.join(args.out, "trace.npz")
    run(controller="oracle", seconds=args.seconds, robot=args.robot,
        record=trace_path, verbose=False,
        render=os.path.join(args.out, "trot_rendered.gif"))
    trace = dict(np.load(trace_path))
    gif = viz.animate_trot(trace, robot1, os.path.join(args.out, "trot.gif"))
    print("wrote", gif)
    print("wrote", os.path.join(args.out, "trot_rendered.gif"))

    # 2. Gait diagram.
    print("wrote", viz.gait_diagram(gait, mpc, 2000, os.path.join(args.out, "gait.png")))

    # 3. Batched SRB sweep metrics.
    B = 4
    tile = lambda t: jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t)
    _, metrics = srb_env.rollout(
        tile(robot1), mpc, tile(gait), tile(Command.trot_forward(1.0)), num_ticks=400
    )
    print("wrote", viz.plot_rollout_metrics(metrics, os.path.join(args.out, "rollout.png")))

    # 4. Predicted-CoM debug plot from one engine solve.
    x_t = jnp.zeros(13, jnp.float32).at[5].set(0.38).at[9].set(1.0).at[12].set(-9.81)
    feet = jnp.array(
        [[0.24, 0.13, -0.38], [0.24, -0.13, -0.38],
         [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]], jnp.float32,
    )
    X_ref = (
        jnp.zeros((10, 13), jnp.float32)
        .at[:, 3].set(0.05 * 1.0 * jnp.arange(10))
        .at[:, 5].set(0.38).at[:, 9].set(1.0).at[:, 12].set(-9.81)
        .reshape(-1)
    )
    table = gaitsched.gait_table(gait, mpc, jnp.int32(0))
    U = engine.solve_scenarios(
        jax.tree.map(lambda x: jnp.asarray(x)[None], robot1), mpc,
        x_t[None], jnp.zeros((1,)), feet[None], X_ref[None], table[None],
        solver="admm", return_full_horizon=True,
    )[0]
    print("wrote", viz.plot_predicted_com(
        robot1, mpc, x_t, 0.0, feet, X_ref, U,
        os.path.join(args.out, "predicted_com.png")))


if __name__ == "__main__":
    main()
