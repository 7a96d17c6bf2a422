#!/usr/bin/env python
"""Finer bisection of the fused-pipeline slowdown (manual==engine==124 ms vs
~52 ms honest stage sum).  Variants isolate: DCE-proof build+setup, fused
setup+iterate, jnp-iterate in the fused program, and 1-iteration pallas (fixed
cost vs per-iteration cost)."""
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
    from pympc_quadruped_tpu.control import refmpc
    from pympc_quadruped_tpu.ops.qp import admm_fast, admm_pallas

    B, h = args.batch, 10
    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(B, h)
    cfg = admm_fast.AdmmFastConfig()
    P0 = admm_fast.cone_pattern(float(mpc.friction_coef), mpc.horizon)
    results = {}

    def vbuild(c):
        return jax.vmap(
            lambda xi, yi, fi, Xi, ti: refmpc.build_qp(robot, mpc, xi, yi, fi, Xi, ti)
        )(c, yaw, feet, X_ref, tables)

    def scan13(fn):
        """Chain via a (B,13) carry; fn returns a (B,>=13) tensor slice."""
        def make(k):
            @jax.jit
            def run():
                def body(c, _):
                    out = fn(c)
                    return c + 1e-9 * out[:, :13], None
                c, _ = jax.lax.scan(body, x_t, None, length=k)
                return c
            return run
        return make

    # (a) build+setup, output DEPENDS on Kinv (no DCE of the Schur inverse)
    def build_setup_kinv(c):
        H, g, mv = vbuild(c)
        ops = admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg)
        return ops.Kinv[:, 0, :]

    # (b) full with jnp iterate instead of pallas
    def full_jnp(c):
        H, g, mv = vbuild(c)
        U = admm_fast.solve_batch(H, g, tables, robot.fz_max, mpc, cfg,
                                  backend="jnp")
        return U * mv

    # (c) full pallas with 1 iteration
    cfg1 = cfg._replace(iterations=1)
    def full_pallas_1it(c):
        H, g, mv = vbuild(c)
        U = admm_fast.solve_batch(H, g, tables, robot.fz_max, mpc, cfg1,
                                  backend="pallas")
        return U * mv

    # (d) setup+iterate fused (H fixed, perturb g through the carry)
    H0, g0, mv0 = jax.jit(vbuild)(x_t)
    def setup_iterate(c):
        g = g0 + 1e-6 * jnp.tile(c[:, :12], (1, h))
        ops = admm_fast.setup(H0, g, tables, robot.fz_max, mpc, cfg)
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return x * ops.d

    for name, fn in [
        ("build_setup_kinv", build_setup_kinv),
        ("setup_iterate", setup_iterate),
        ("full_pallas_1it", full_pallas_1it),
        ("full_jnp", full_jnp),
    ]:
        try:
            results[name] = marginal_ms(scan13(fn), args.iters, args.k)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
