#!/usr/bin/env python
"""Production scenario sweep — the TPU-native analog of the reference's
multi-robot entry point (ref ``scripts/isaacgym_a1.py``), scaled from its 4
sequential robots to thousands of lockstep scenarios on a device mesh.

Randomizes robot mass/inertia across the batch, closes the loop in the
on-device SRB environment (optionally on terrain, optionally driven by the
two-stage KF instead of ground truth), reduces metrics across the mesh via
collectives, logs through the async MetricsLogger, and checkpoints sweep
state for resume.

Single host:
    python examples/sweep.py --batch 1024 --seconds 2

Multi-host (per host, SURVEY §2.4):
    JAX_COORDINATOR=host0:1234 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
        python examples/sweep.py --batch 65536 ...
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256, help="global scenario count")
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--robot", choices=["aliengo", "a1"], default="aliengo")
    ap.add_argument("--vx", type=float, default=1.0)
    ap.add_argument("--terrain", choices=["none", "rough", "slope"], default="none")
    ap.add_argument("--estimator", action="store_true", help="drive via the KF")
    ap.add_argument("--contact-source", choices=["plan", "measured"],
                    default="plan", dest="contact_source",
                    help="KF leg-odometry gate: planned stance schedule or "
                         "touch synthesized from held GRFs (robust to "
                         "schedule slip; see srb_env.rollout)")
    ap.add_argument("--chunk-ticks", type=int, default=500)
    ap.add_argument("--ckpt-dir", default=None, help="checkpoint/resume directory")
    ap.add_argument("--stop-after-chunks", type=int, default=None,
                    help="exit after N chunks (simulated preemption; resume "
                         "by re-running with the same --ckpt-dir)")
    ap.add_argument("--gaits", default=None,
                    help="comma-separated gait names for a mixed-gait sweep "
                         "(BASELINE config 3), e.g. trotting10,pacing10,bounding8; "
                         "overrides the single-gait default and prints per-gait stats")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import a1, aliengo
    from pympc_quadruped_tpu.env import srb_env, terrain as terrain_lib
    from pympc_quadruped_tpu.estimation import kf
    from pympc_quadruped_tpu.parallel import launch, mesh as mesh_lib, sweep
    from pympc_quadruped_tpu.utils.observability import MetricsLogger

    launch.init_distributed()
    mesh = launch.global_data_mesh()
    B = args.batch
    print(f"devices={mesh.devices.size} hosts={jax.process_count()} batch={B}")

    mpc = MpcParams(horizon=10)
    key = jax.random.PRNGKey(args.seed)
    base = aliengo() if args.robot == "aliengo" else a1()
    robot_b = sweep.randomized_robots(base, B, key)
    tile = lambda t: jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t)
    gait_ids = None
    if args.gaits:
        gait_names = args.gaits.split(",")
        gait_b, cmd_b, gait_ids = sweep.mixed_gait_batch(gait_names, B)
    else:
        gait_b = tile(Gaits.trotting10())
        cmd_b = tile(Command.trot_forward(args.vx))

    terrain_b = None
    if args.terrain != "none":
        one = (
            terrain_lib.random_rough(jax.random.PRNGKey(7), amplitude=0.02)
            if args.terrain == "rough"
            else terrain_lib.slope(0.15)
        )
        terrain_b = tile(one)

    robot_b, gait_b, cmd_b = mesh_lib.shard_global_batch(
        (robot_b, gait_b, cmd_b), mesh
    )
    if terrain_b is not None:
        terrain_b = mesh_lib.shard_global_batch(terrain_b, mesh)

    est = kf.KfParams.default() if args.estimator else None

    # The WHOLE loop state is one sharded pytree: env states, controller
    # carries (incl. QP warm starts), KF states + held forces, absolute tick.
    # Chunks thread it; the checkpoint holds it; resume continues bitwise.
    if terrain_b is not None:
        env0 = jax.vmap(srb_env.init_state_on_terrain)(robot_b, terrain_b)
    else:
        env0 = jax.vmap(srb_env.default_init_state)(robot_b)
    sweep_state = {
        "env": env0,
        "carry": srb_env.init_full_carry(robot_b, mpc, env0, est),
        "tick": mesh_lib.replicate(jnp.int32(0), mesh),
    }

    @jax.jit
    def run_chunk(sweep_state, robot_b, gait_b, cmd_b):
        (state, carry), metrics = srb_env.rollout(
            robot_b, mpc, gait_b, cmd_b, num_ticks=args.chunk_ticks,
            init_state=sweep_state["env"], carry_in=sweep_state["carry"],
            tick0=sweep_state["tick"], terrain=terrain_b, estimator=est,
            key=key, return_full_carry=True,
            contact_source=args.contact_source,
        )
        tail = metrics["vel_err"][-args.chunk_ticks // 4:]
        out = {
            "mean_vel_err": jnp.mean(tail),
            "max_vel_err": jnp.max(tail),
            "mean_height": jnp.mean(metrics["height"][-1]),
            "divergence_events": jnp.sum(metrics["diverged"].astype(jnp.int32)),
        }
        if est is not None:
            out["mean_est_vel_err"] = jnp.mean(metrics["est_vel_err"])
            if args.contact_source == "measured":
                out["mean_contact_mismatch"] = jnp.mean(
                    metrics["contact_mismatch"]
                )
        new_state = {
            "env": state,
            "carry": carry,
            "tick": sweep_state["tick"] + jnp.int32(args.chunk_ticks),
        }
        return new_state, out

    ckpt = None
    start_chunk = 0
    if args.ckpt_dir:
        from pympc_quadruped_tpu.parallel.checkpoint import SweepCheckpointer

        ckpt = SweepCheckpointer(args.ckpt_dir, keep=2)
        start_chunk, sweep_state = ckpt.restore_or(sweep_state)
        if start_chunk:
            print(f"resuming at chunk {start_chunk} (tick {int(jax.device_get(sweep_state['tick']))})")

    logger = MetricsLogger()
    n_chunks = max(1, int(args.seconds * 1000) // args.chunk_ticks)
    stop_at = n_chunks if args.stop_after_chunks is None else min(
        n_chunks, start_chunk + args.stop_after_chunks
    )
    t0 = time.time()
    for c in range(start_chunk, stop_at):
        sweep_state, summary = run_chunk(sweep_state, robot_b, gait_b, cmd_b)
        logger.append(summary)
        if ckpt is not None:
            ckpt.save(c + 1, sweep_state)
    wall = time.time() - t0
    series = logger.drain()
    if ckpt is not None:
        ckpt.close()

    ticks = (stop_at - start_chunk) * args.chunk_ticks
    print(f"chunks={stop_at}/{n_chunks} wall={wall:.1f}s "
          f"ticks/s={B * ticks / max(wall, 1e-9):,.0f}")
    for k, v in series.items():
        print(f"  {k}: last={float(v[-1]):.4f} mean={float(np.mean(v)):.4f}")

    if gait_ids is not None and stop_at == n_chunks and jax.process_count() == 1:
        # Per-gait survival/tracking over the final chunk's end state
        # (single-host report; multi-host sweeps read the logged metrics).
        import numpy as _np

        env = jax.device_get(sweep_state["env"])
        ids = _np.asarray(jax.device_get(gait_ids))
        for i, name in enumerate(gait_names):
            m = ids == i
            h = env.pos[m, 2]
            alive = float(_np.mean((h > 0.1) & (h < 1.0)))
            print(f"  gait {name}: n={int(m.sum())} survival={alive:.3f} "
                  f"fwd_disp_m={float(_np.mean(env.pos[m, 0])):.2f}")


if __name__ == "__main__":
    main()
