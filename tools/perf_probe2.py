#!/usr/bin/env python
"""Bisect the full-pipeline vs stage-sum gap: engine.solve_scenarios (124.8 ms
marginal at 4096 in the r3 probe) vs a manual build->setup->iterate->unscale
composition (~31 ms by stage sum).  Suspects: the engine's robot broadcast
(per-scenario robot pytree defeating CSE of shared subexpressions) and
anything solve_batch adds around the iterate."""
import argparse, json, os, sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))

from perf_probe import marginal_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--k", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build_inputs
    from pympc_quadruped_tpu import engine
    from pympc_quadruped_tpu.control import refmpc
    from pympc_quadruped_tpu.ops.qp import admm_fast, admm_pallas

    B, h = args.batch, 10
    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(B, h)
    cfg = admm_fast.AdmmFastConfig()
    P0 = admm_fast.cone_pattern(float(mpc.friction_coef), mpc.horizon)
    robot_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)), robot
    )
    results = {}

    def scan_over(fn):
        def make(k):
            @jax.jit
            def run():
                def body(c, _):
                    U = fn(c)
                    c2 = c + 1e-6 * jnp.pad(U[:, :12], ((0, 0), (0, 1)))[:, :13]
                    return c2, None
                c, _ = jax.lax.scan(body, x_t, None, length=k)
                return c
            return run
        return make

    # (a) engine path exactly as the bench runs it
    def eng(c):
        return engine.solve_scenarios(robot, mpc, c, yaw, feet, X_ref, tables,
                                      solver="admm")

    # (b) manual: closed-over shared robot, solve_batch (includes setup+pallas)
    def manual(c):
        H, g, mv = jax.vmap(
            lambda xi, yi, fi, Xi, ti: refmpc.build_qp(robot, mpc, xi, yi, fi, Xi, ti)
        )(c, yaw, feet, X_ref, tables)
        U = admm_fast.solve_batch(H, g, tables, robot.fz_max, mpc, cfg,
                                  backend="pallas")
        return U * mv

    # (c) manual with BROADCAST robot vmapped over (engine's exact build)
    def manual_bcast(c):
        H, g, mv = jax.vmap(
            lambda r, xi, yi, fi, Xi, ti: refmpc.build_qp(r, mpc, xi, yi, fi, Xi, ti)
        )(robot_b, c, yaw, feet, X_ref, tables)
        U = admm_fast.solve_batch(H, g, robot_b.fz_max, mpc, cfg,
                                  backend="pallas") if False else admm_fast.solve_batch(
            H, g, tables, robot_b.fz_max, mpc, cfg, backend="pallas")
        return U * mv

    # (d) manual with explicit setup + pallas (no solve_batch wrapper)
    def manual_explicit(c):
        H, g, mv = jax.vmap(
            lambda xi, yi, fi, Xi, ti: refmpc.build_qp(robot, mpc, xi, yi, fi, Xi, ti)
        )(c, yaw, feet, X_ref, tables)
        ops = admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg)
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return (x * ops.d) * mv

    for name, fn in [("engine", eng), ("manual", manual),
                     ("manual_bcast_robot", manual_bcast),
                     ("manual_explicit", manual_explicit)]:
        try:
            results[name] = marginal_ms(scan_over(fn), args.iters, args.k)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
