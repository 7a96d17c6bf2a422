#!/usr/bin/env python
"""Sharding-overhead curve of the sharded sweep step at 1/2/4/8 devices
(BASELINE config 5's multi-device leg).

Multi-chip hardware is not available in this environment, and the virtual
CPU mesh's devices all MULTIPLEX the same physical cores — so weak-scaling
throughput there is 1/N by construction and meaningless.  What the virtual
mesh CAN measure honestly is the cost our sharded program ADDS: the same
global batch, same silicon, partitioned over N devices (shard_map
partitioning + collective lowering + per-shard dispatch) vs run unsharded.
``sharding_efficiency = t(1 device) / t(N devices)`` — 1.0 means the
sharded program costs nothing extra, so on real chips (independent silicon
per shard) throughput would scale linearly.  Companion legs: the real-chip
``pod_scale`` row in bench.py and the 2-process jax.distributed DCN test
(tests/test_multihost.py).

Each device count needs a fresh process (the device count is fixed at
backend init), so this driver re-execs itself.

Usage: python tools/scaling_curve.py            # full curve -> JSON line
       python tools/scaling_curve.py --devices 4  # one point (internal)
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GLOBAL_BATCH = 2048


def one_point(n_devices: int, iters: int = 5):
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import time

    import numpy as np
    from bench import build_inputs
    from pympc_quadruped_tpu.parallel import mesh as mesh_lib, sweep

    assert len(jax.devices()) >= n_devices, jax.devices()
    mesh = mesh_lib.data_mesh(jax.devices()[:n_devices])
    B = GLOBAL_BATCH
    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(B, 10)
    args = mesh_lib.shard_batch((x_t, yaw, feet, X_ref, tables), mesh)
    x_t, yaw, feet, X_ref, tables = args

    def run():
        return sweep.solve_sweep_step(
            robot, mpc, x_t, yaw, feet, X_ref, tables, solver="admm"
        )

    jax.block_until_ready(run())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append(time.perf_counter() - t0)
    p50 = float(np.percentile(np.array(ts), 50))
    return {"devices": n_devices, "batch": B, "p50_s": round(p50, 4),
            "solves_per_s": round(B / p50, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    if args.devices is not None:
        os.environ["JAX_PLATFORMS"] = "cpu"
        print(json.dumps(one_point(args.devices, args.iters)))
        return

    points = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--devices", str(n),
             "--iters", str(args.iters)],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        points.append(json.loads(r.stdout.strip().splitlines()[-1]))
    base = points[0]["p50_s"]
    for p in points:
        p["sharding_efficiency"] = round(base / p["p50_s"], 3)
    print(json.dumps({"global_batch": GLOBAL_BATCH, "points": points}))


if __name__ == "__main__":
    main()
