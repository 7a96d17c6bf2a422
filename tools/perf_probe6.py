#!/usr/bin/env python
"""Validate the in-kernel-inversion plan: does K (ruiz + ata assembly, no
spd_inverse) feed a pallas kernel cleanly?

  a) setup_lite -> pallas iterate using K in place of Kinv (perf-equivalent
     shape-wise; math is nonsense, we only time it)
  b) build + setup_lite -> same (the full planned pipeline's producer chain)
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
    from pympc_quadruped_tpu.models.mpc import MpcParams
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
    jax.block_until_ready(H0)

    def setup_lite(H, g):
        """Everything admm_fast.setup does EXCEPT the spd_inverse."""
        n = g.shape[-1]
        hh = mpc.horizon
        mu = mpc.friction_coef
        srow, l, u = admm_fast.row_bounds(tables, robot.fz_max, hh)
        Hs, d = admm_fast.ruiz_scaling(H, srow, None, cfg.ruiz_iters)
        g_s = g * d
        e = 1.0 / jnp.clip(admm_fast.pattern_row_norms(mu, d, hh), 1e-8, None)
        es = e * srow
        l_s = l * e
        u_s = u * e
        tight = (u_s - l_s) < 1e-6
        rho = jnp.where(tight, cfg.rho_eq, cfg.rho).astype(H.dtype)
        pat = admm_fast._pyramid_rows(mu).astype(H.dtype)
        w = (rho * es * es).reshape(B, 4 * hh, admm_fast.ROWS_PER_BLOCK)
        core = jnp.einsum("rc,bkr,rd->bkcd", pat, w, pat,
                          precision=jax.lax.Precision.HIGHEST)
        db = d.reshape(B, 4 * hh, 3)
        core = core * db[..., :, None] * db[..., None, :]
        eye_blk = jnp.eye(4 * hh, dtype=H.dtype)
        ata = jnp.einsum("bkcd,kj->bkcjd", core, eye_blk,
                         precision=jax.lax.Precision.HIGHEST).reshape(B, n, n)
        K = Hs + ata + cfg.sigma * jnp.eye(n, dtype=H.dtype)
        return admm_fast.AdmmOperands(
            Kinv=K, q=g_s, d=d, es=es, rho=rho, l=l_s, u=u_s
        )

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

    cfg_short = cfg._replace(iterations=8)  # keep the timing iterate-light

    def klite_pallas(c):
        H = H0 * (1.0 + 1e-9 * c[:, 0])[:, None, None]
        ops = setup_lite(H, g0)
        x, y = admm_pallas.iterate(ops, P0, cfg_short)
        return x * ops.d

    def build_klite_pallas(c):
        H, g, mv = vbuild(c)
        ops = setup_lite(H, g)
        x, y = admm_pallas.iterate(ops, P0, cfg_short)
        return (x * ops.d) * mv

    for name, fn in [
        ("klite_pallas", klite_pallas),
        ("build_klite_pallas", build_klite_pallas),
    ]:
        try:
            results[name] = marginal_ms(scan13(fn), args.iters, args.k)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(name, results[name], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
