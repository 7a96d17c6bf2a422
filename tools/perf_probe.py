#!/usr/bin/env python
"""Device-marginal stage decomposition of the headline solve pipeline.

bench.py's ``stage_ms`` times each stage with single jitted calls, which on
this platform carry a ~23-31 ms fixed dispatch overhead — too coarse to
attribute the end-to-end device time (marginal 124 ms at batch 4096 in r2 vs
a naive stage sum of ~58 ms).  This probe measures every stage AND the
composites with the same chained-scan marginal method the headline uses, so
the numbers add up and the optimization target is unambiguous.

Usage:  python tools/perf_probe.py [--batch 4096] [--iters 8] [--k 6]
Prints one JSON dict of marginal milliseconds per stage.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

import numpy as np


def marginal_ms(make_chained, iters, K):
    """(t(K) - t(1)) / (K - 1) with per-sample pairing.

    Both runs use the same number of samples; the marginal percentile is
    taken over the pairwise differences (sorted), not the difference of
    percentiles, so one outlier in either run cannot produce a negative or
    zero marginal (advisor r2 finding).
    """
    import jax

    def run(fn):
        out = fn()
        jax.block_until_ready(out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return np.sort(np.array(ts))

    t1 = run(make_chained(1))
    tk = run(make_chained(K))
    diffs = (tk - t1) / (K - 1)
    return {
        "p50_ms": round(float(np.percentile(diffs, 50)) * 1e3, 3),
        "p99_ms": round(float(np.percentile(diffs, 99)) * 1e3, 3),
        "single_ms": round(float(np.percentile(t1, 50)) * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_inputs
    from pympc_quadruped_tpu import engine
    from pympc_quadruped_tpu.control import refmpc
    from pympc_quadruped_tpu.ops.qp import admm_fast

    B, h = args.batch, args.horizon
    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(B, h)
    cfg = admm_fast.AdmmFastConfig()
    P0 = admm_fast.cone_pattern(float(mpc.friction_coef), mpc.horizon)

    def vbuild(x):
        return jax.vmap(
            lambda xi, yi, fi, Xi, ti: refmpc.build_qp(robot, mpc, xi, yi, fi, Xi, ti)
        )(x, yaw, feet, X_ref, tables)

    H0, g0, mv0 = jax.jit(vbuild)(x_t, )
    ops0 = jax.jit(lambda H, g: admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg))(H0, g0)
    jax.block_until_ready(ops0)

    results = {"batch": B, "horizon": h, "backend": jax.default_backend(),
               "device": str(jax.devices()[0])}

    # --- full pipeline (the headline) ---
    def full(k):
        @jax.jit
        def run():
            def body(c, _):
                U = engine.solve_scenarios(robot, mpc, c, yaw, feet, X_ref, tables, solver="admm")
                c2 = c + 1e-6 * jnp.pad(U, ((0, 0), (0, 1)))[:, :13]
                return c2, None
            c, _ = jax.lax.scan(body, x_t, None, length=k)
            return c
        return run

    # --- build_qp only ---
    def build_only(k):
        @jax.jit
        def run():
            def body(c, _):
                H, g, mv = vbuild(c)
                c2 = c + 1e-9 * g[:, :13]
                return c2, None
            c, _ = jax.lax.scan(body, x_t, None, length=k)
            return c
        return run

    # --- setup only (Ruiz + ata + Schur inverse) ---
    def setup_only(k):
        @jax.jit
        def run():
            def body(c, _):
                ops = admm_fast.setup(c, g0, tables, robot.fz_max, mpc, cfg)
                c2 = c + 1e-9 * ops.Kinv
                return c2, None
            c, _ = jax.lax.scan(body, H0, None, length=k)
            return c
        return run

    # --- solver stage from a carried operand: on TPU the shipping split
    # path (inversion kernel + iteration kernel, carried K); on CPU the
    # iterate-only jnp loop from a pre-inverted Kinv (labeled accordingly
    # — the CPU row is NOT comparable to the TPU invert+iterate row).
    on_tpu = jax.default_backend() == "tpu"
    solver_stage = "invert_iterate_split" if on_tpu else "iterate_only_jnp"
    if on_tpu:
        opsK = jax.jit(lambda H, g: admm_fast.setup(
            H, g, tables, robot.fz_max, mpc, cfg, invert=False))(H0, g0)
        K0 = opsK.K

        def iterate_only(k):
            @jax.jit
            def run():
                def body(c, _):
                    from pympc_quadruped_tpu.ops.qp import admm_pallas
                    x, y = admm_pallas.invert_iterate(
                        opsK._replace(K=c), P0, cfg)
                    c2 = c + 1e-12 * x[:, :, None] * x[:, None, :]
                    return c2, None
                c, _ = jax.lax.scan(body, K0, None, length=k)
                return c
            return run
    else:
        def iterate_only(k):
            @jax.jit
            def run():
                def body(c, _):
                    x, y = admm_fast.iterate_jnp(ops0._replace(q=c), P0, cfg)
                    return c + 1e-9 * x, None
                c, _ = jax.lax.scan(body, ops0.q, None, length=k)
                return c
            return run

    # --- build + setup ---
    def build_setup(k):
        @jax.jit
        def run():
            def body(c, _):
                H, g, mv = vbuild(c)
                ops = admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg)
                c2 = c + 1e-9 * ops.q[:, :13]
                return c2, None
            c, _ = jax.lax.scan(body, x_t, None, length=k)
            return c
        return run

    # --- setup sub-stages ---
    def ruiz_only(k):
        @jax.jit
        def run():
            def body(c, _):
                Hs, d = admm_fast.ruiz_scaling(c, None, None, cfg.ruiz_iters)
                return c + 1e-9 * Hs, None
            c, _ = jax.lax.scan(body, H0, None, length=k)
            return c
        return run

    def spdinv_only(k):
        K0 = H0 + 0.01 * jnp.eye(H0.shape[-1], dtype=H0.dtype)
        @jax.jit
        def run():
            def body(c, _):
                X = admm_fast.spd_inverse(c, cfg.newton_schulz_iters)
                return c + 1e-9 * X, None
            c, _ = jax.lax.scan(body, K0, None, length=k)
            return c
        return run

    for name, make in [
        ("full", full),
        ("build_qp", build_only),
        ("setup", setup_only),
        (solver_stage, iterate_only),
        ("build+setup", build_setup),
        ("ruiz", ruiz_only),
        ("spd_inverse", spdinv_only),
    ]:
        try:
            results[name] = marginal_ms(make, args.iters, args.k)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
