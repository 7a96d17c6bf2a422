#!/usr/bin/env python
"""Isolate WHICH setup producer poisons the pallas composition:
  a) spd_inverse output feeding pallas (fresh elementwise SPD input)
  b) full setup vectors fresh, Kinv held fixed
  c) like (a) but with spd_inverse's quadrant CONCATENATE assembly replaced
     by pad+add (layout-friendly elementwise) via a monkeypatched rec()
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

    def vbuild(c):
        return jax.vmap(
            lambda xi, yi, fi, Xi, ti: refmpc.build_qp(robot, mpc, xi, yi, fi, Xi, ti)
        )(c, yaw, feet, X_ref, tables)

    H0, g0, mv0 = jax.jit(vbuild)(x_t)
    ops0 = jax.jit(
        lambda H, g: admm_fast.setup(H, g, tables, robot.fz_max, mpc, cfg)
    )(H0, g0)
    K0 = jax.jit(
        lambda H: 0.5 * (H + jnp.swapaxes(H, -1, -2))
        + 1.0 * jnp.eye(H.shape[-1], H.shape[-1], dtype=H.dtype)
    )(H0)
    jax.block_until_ready((H0, ops0, K0))
    results = {}

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

    def spdinv_to_pallas(c):
        K = K0 * (1.0 + 1e-9 * c[:, 0])[:, None, None]
        Kinv = admm_fast.spd_inverse(K, cfg.newton_schulz_iters)
        ops = ops0._replace(Kinv=Kinv)
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return x * ops.d

    def setup_noinv_to_pallas(c):
        g = g0 * (1.0 + 1e-9 * c[:, :1])
        ops = admm_fast.setup(H0, g, tables, robot.fz_max, mpc, cfg)
        ops = ops._replace(Kinv=ops0.Kinv)
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return x * ops.d

    # (c) pad+add quadrant assembly
    def spd_inverse_padadd(K, ns_iters):
        def sym(M):
            return 0.5 * (M + jnp.swapaxes(M, -1, -2))

        mm = admm_fast._mm

        def rec(M):
            n = M.shape[-1]
            if n <= 16:
                return admm_fast._gauss_jordan_inv(M)
            m = n // 2
            A = M[..., :m, :m]
            Bm = M[..., :m, m:]
            C = M[..., m:, m:]
            Ai = rec(A)
            W = mm(Ai, Bm)
            S = sym(C - mm(jnp.swapaxes(Bm, -1, -2), W))
            Si = rec(S)
            WSi = mm(W, Si)
            TL = sym(Ai + mm(WSi, jnp.swapaxes(W, -1, -2)))
            # explicit slice-set assembly, no concatenate:
            z = jnp.zeros(M.shape[:-2] + (n, n), M.dtype)
            z = z.at[..., :m, :m].set(TL)
            z = z.at[..., :m, m:].set(-WSi)
            z = z.at[..., m:, :m].set(-jnp.swapaxes(WSi, -1, -2))
            z = z.at[..., m:, m:].set(Si)
            return z

        X = rec(0.5 * (K + jnp.swapaxes(K, -1, -2)))
        eye2 = 2.0 * jnp.eye(K.shape[-1], dtype=K.dtype)
        for _ in range(ns_iters):
            X = mm(X, eye2 - mm(K, X))
            X = 0.5 * (X + jnp.swapaxes(X, -1, -2))
        return X

    def spdinv_dus_to_pallas(c):
        K = K0 * (1.0 + 1e-9 * c[:, 0])[:, None, None]
        Kinv = spd_inverse_padadd(K, cfg.newton_schulz_iters)
        ops = ops0._replace(Kinv=Kinv)
        x, y = admm_pallas.iterate(ops, P0, cfg)
        return x * ops.d

    for name, fn in [
        ("spdinv_to_pallas", spdinv_to_pallas),
        ("setup_noinv_to_pallas", setup_noinv_to_pallas),
        ("spdinv_dus_to_pallas", spdinv_dus_to_pallas),
    ]:
        try:
            results[name] = marginal_ms(scan13(fn), args.iters, args.k)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
