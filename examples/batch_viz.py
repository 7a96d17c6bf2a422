#!/usr/bin/env python
"""Tiled multi-robot viewer for BATCHED on-device rollouts.

The reference renders its multi-robot IsaacGym env live
(ref ``utils/isaacgym_utils.py:241-263``: env/actor grid + viewer).  The
TPU-native equivalent separates simulation from rendering: the batch runs
ON DEVICE (full-order articulated env, thousands of scenarios if asked),
(pos, quat, q) snapshots are recorded every few ticks, and this script
REPLAYS them into a render-only MuJoCo grid scene
(``env/mjcf.build_mjcf_grid`` — one free body + 12 joints per instance,
no actuators/contacts) to produce a tiled GIF.

Usage:
    JAX_PLATFORMS=cpu python examples/batch_viz.py --n 9 --seconds 3 \
        --out docs/batch_grid.gif
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu").split(",")[0])

import jax.numpy as jnp
import numpy as np


def record_batch(n, seconds, frame_ticks=40, vx=0.6):
    """Run n mixed-gait full-order scenarios on device; return snapshots."""
    from pympc_quadruped_tpu.env import fullorder
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import aliengo

    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    # Mix gaits across the grid (same period structure at h=10).
    gaits = [Gaits.trotting10(), Gaits.pacing10(), Gaits.bounding8()]
    gait = jax.tree.map(
        lambda *leaves: jnp.stack([leaves[i % 3] for i in range(n)]),
        *[jax.tree.map(jnp.asarray, g) for g in gaits],
    )
    # Ramp of speeds down the grid.
    vxs = jnp.asarray(
        [vx * (0.6 + 0.4 * (i // 3) / max(1, (n - 1) // 3)) for i in range(n)],
        jnp.float32,
    )
    cmd = Command(
        vel_base_des=jnp.stack(
            [jnp.array([float(v), 0.0, 0.0], jnp.float32) for v in vxs]
        ),
        yaw_turn_rate=jnp.zeros((n,), jnp.float32),
    )

    from pympc_quadruped_tpu.control import controller as ctrl

    state = jax.vmap(fullorder.default_init_state)(robot)
    carry = jax.vmap(lambda _: ctrl.init_carry(mpc.horizon))(jnp.arange(n))

    # ONE compiled chunk program, tick0 traced: every chunk after the first
    # is a jit cache hit (an eager rollout call per chunk would recompile
    # 75 times and exhaust process mappings — measured rc=139).
    @jax.jit
    def chunk(state, carry, t0):
        return fullorder.rollout(
            robot, mpc, gait, cmd, num_ticks=frame_ticks,
            state0=state, carry0=carry, tick0=t0,
        )

    frames = []
    total = int(seconds * 1000)
    for t0 in range(0, total, frame_ticks):
        (state, carry), _ = chunk(state, carry, jnp.int32(t0))
        frames.append((np.asarray(state.pos), np.asarray(state.quat),
                       np.asarray(state.q)))
        print(f"  t={t0 + frame_ticks} ms  mean height "
              f"{float(state.pos[:, 2].mean()):.3f}", file=sys.stderr)
    return frames


def render_grid(frames, n, out, spacing=1.2, fps=25):
    import mujoco
    from pympc_quadruped_tpu.env import mjcf

    model = mujoco.MjModel.from_xml_string(
        mjcf.grid_model_xml("aliengo", n, spacing)
    )
    data = mujoco.MjData(model)
    renderer = mujoco.Renderer(model, height=480, width=640)
    import math

    cols = int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    cam = mujoco.MjvCamera()
    cam.lookat[:] = [(cols - 1) * spacing / 2, (rows - 1) * spacing / 2, 0.25]
    cam.distance = 1.35 * spacing * max(cols, rows)
    cam.azimuth = -120.0
    cam.elevation = -28.0
    images = []
    for pos, quat, q in frames:
        for i in range(n):
            base = i * 19
            gx, gy = (i % cols) * spacing, (i // cols) * spacing
            # Each instance walks in place at its grid cell (x/y wrapped
            # into the cell so the tiles stay tiled).
            data.qpos[base:base + 3] = [
                gx + float(pos[i, 0]) % (0.6 * spacing) - 0.3 * spacing,
                gy + float(pos[i, 1]) % (0.4 * spacing) - 0.2 * spacing,
                pos[i, 2],
            ]
            data.qpos[base + 3:base + 7] = quat[i]
            data.qpos[base + 7:base + 19] = q[i]
        mujoco.mj_forward(model, data)
        renderer.update_scene(data, camera=cam)
        images.append(renderer.render().copy())
    try:
        import imageio

        imageio.mimsave(out, images, fps=fps, loop=0)
    except ImportError:  # minimal PIL fallback
        from PIL import Image

        ims = [Image.fromarray(im) for im in images]
        ims[0].save(out, save_all=True, append_images=ims[1:],
                    duration=int(1000 / fps), loop=0)
    print(f"wrote {out} ({len(images)} frames, {n} robots)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=9)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--out", default="docs/batch_grid.gif")
    ap.add_argument("--frame-ticks", type=int, default=40)
    args = ap.parse_args()
    frames = record_batch(args.n, args.seconds, args.frame_ticks)
    render_grid(frames, args.n, args.out, fps=1000 // args.frame_ticks)


if __name__ == "__main__":
    main()
