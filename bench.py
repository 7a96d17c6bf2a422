#!/usr/bin/env python
"""Headline benchmark: batched condensed-QP MPC solves/s on one chip.

Measures the full engine step (SRB state-space build -> exact ZOH ->
condensing -> fixed-iteration QP solve) at the BASELINE 10-step horizon over
a scenario batch, end-to-end on device, and prints ONE JSON line:

    {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
     "vs_baseline": N / 12500.0, ...}

``vs_baseline`` normalizes against this chip's pro-rata share of the
BASELINE.json target (>=100k solves/s on v5p-16 == 8 chips -> 12.5k per
chip); >1.0 beats the target.  Extra diagnostic fields (p50/p99 solve
latency vs the 20 ms real-time budget, per-solver numbers) ride along.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np


def build_inputs(batch, horizon, seed=0):
    import jax.numpy as jnp
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import aliengo
    from pympc_quadruped_tpu.ops import gaitsched

    rng = np.random.default_rng(seed)
    mpc = MpcParams(horizon=horizon)
    robot = aliengo()
    gait = Gaits.trotting10() if horizon == 10 else Gaits.trotting16()

    # Trot-like state distribution (same family as tests/test_qp.py).
    yaw = rng.uniform(-0.3, 0.3, size=batch).astype(np.float32)
    x_t = np.zeros((batch, 13), np.float32)
    x_t[:, 0:2] = rng.normal(scale=0.05, size=(batch, 2))
    x_t[:, 2] = yaw
    x_t[:, 3:5] = rng.normal(scale=0.02, size=(batch, 2))
    x_t[:, 5] = 0.38 + rng.normal(scale=0.01, size=batch)
    x_t[:, 6:9] = rng.normal(scale=0.3, size=(batch, 3))
    x_t[:, 9] = 1.2 + rng.normal(scale=0.2, size=batch)
    x_t[:, 10:12] = rng.normal(scale=0.1, size=(batch, 2))
    x_t[:, 12] = -9.81

    base_feet = np.array(
        [[0.24, 0.13, -0.38], [0.24, -0.13, -0.38], [-0.24, 0.13, -0.38], [-0.24, -0.13, -0.38]],
        np.float32,
    )
    feet = base_feet[None] + rng.normal(scale=0.03, size=(batch, 4, 3)).astype(np.float32)

    X_ref = np.zeros((batch, horizon, 13), np.float32)
    X_ref[:, :, 2] = yaw[:, None]
    X_ref[:, :, 3] = x_t[:, 3:4] + 0.05 * 1.2 * np.arange(horizon)[None, :]
    X_ref[:, :, 5] = 0.38
    X_ref[:, :, 9] = 1.2
    X_ref[:, :, 12] = -9.81

    # Mix of gait phases across the batch.
    import jax
    ticks = jnp.asarray(rng.integers(0, 200, size=batch) * 20, jnp.int32)
    tables = jax.vmap(lambda t: gaitsched.gait_table(gait, mpc, t))(ticks)

    return (
        robot,
        mpc,
        jnp.asarray(x_t),
        jnp.asarray(yaw),
        jnp.asarray(feet),
        jnp.asarray(X_ref.reshape(batch, -1)),
        tables,
    )


def bench_solver(solver, batch, horizon, iters=20):
    import jax
    from pympc_quadruped_tpu import engine

    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(batch, horizon)

    fn = jax.jit(
        lambda x, y, f, Xr, t: engine.solve_scenarios(
            robot, mpc, x, y, f, Xr, t, solver=solver
        )
    )
    out = fn(x_t, yaw, feet, X_ref, tables)
    out.block_until_ready()  # compile

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x_t, yaw, feet, X_ref, tables)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    return {
        "p50_s": float(np.percentile(times, 50)),
        "p99_s": float(np.percentile(times, 99)),
        "min_s": float(times.min()),
        "solves_per_s": batch / float(np.percentile(times, 50)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    dev = jax.devices()[0]
    results = {}
    for solver in ("admm", "ipm"):
        try:
            results[solver] = bench_solver(solver, args.batch, args.horizon, args.iters)
        except Exception as e:  # pragma: no cover - report partial results
            results[solver] = {"error": str(e)[:200]}

    best_name = max(
        (s for s in results if "solves_per_s" in results[s]),
        key=lambda s: results[s]["solves_per_s"],
        default=None,
    )
    if best_name is None:
        print(json.dumps({"metric": "mpc_solves_per_s", "value": 0.0,
                          "unit": "solves/s", "vs_baseline": 0.0,
                          "error": str(results)}))
        return

    best = results[best_name]
    # BASELINE: >=100k solves/s on v5p-16 (8 chips) -> 12.5k per chip.
    per_chip_target = 100_000.0 / 8.0
    record = {
        "metric": "mpc_solves_per_s",
        "value": round(best["solves_per_s"], 1),
        "unit": "solves/s",
        "vs_baseline": round(best["solves_per_s"] / per_chip_target, 3),
        "solver": best_name,
        "batch": args.batch,
        "horizon": args.horizon,
        "p50_latency_ms": round(best["p50_s"] * 1e3, 3),
        "p99_latency_ms": round(best["p99_s"] * 1e3, 3),
        "realtime_budget_ms": 20.0,
        "device": str(dev),
        "all_solvers": {
            k: ({kk: round(vv, 4) if isinstance(vv, float) else vv for kk, vv in v.items()})
            for k, v in results.items()
        },
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
