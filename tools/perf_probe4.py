#!/usr/bin/env python
"""Layout-battle fixes for the setup->pallas composition penalty (~70 ms of
(4096,120,120) layout-conversion copies seen in the compiled HLO).

Variants:
  a) optimization_barrier between setup and the pallas call
  b) pallas fed a FRESH Kinv from a trivially-fusable elementwise op
     (isolates: is the consumer fine when the producer has default layout?)
  c) pallas fed swapaxes(Kinv): Kinv is exactly symmetric (setup's final
     Newton-Schulz symmetrizes), so the transpose is mathematically free and
     may bitcast away the producer's transposed layout
"""
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

    H0, g0, mv0 = jax.jit(vbuild)(x_t)
    ops0 = jax.jit(
        lambda H, g: admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg)
    )(H0, g0)
    jax.block_until_ready((H0, ops0))

    def scan13(fn):
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

    def full_barrier(c):
        H, g, mv = vbuild(c)
        ops = admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg)
        ops = jax.lax.optimization_barrier(ops)
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return (x * ops.d) * mv

    def fresh_kinv(c):
        scale = 1.0 + 1e-9 * c[:, 0]
        ops = ops0._replace(
            Kinv=ops0.Kinv * scale[:, None, None], q=ops0.q * scale[:, None]
        )
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return x * ops.d

    def full_swapT(c):
        H, g, mv = vbuild(c)
        ops = admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg)
        ops = ops._replace(Kinv=jnp.swapaxes(ops.Kinv, -1, -2))
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return (x * ops.d) * mv

    for name, fn in [
        ("full_barrier", full_barrier),
        ("fresh_kinv_pallas", fresh_kinv),
        ("full_swapT", full_swapT),
    ]:
        try:
            results[name] = marginal_ms(scan13(fn), args.iters, args.k)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
