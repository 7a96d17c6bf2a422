#!/usr/bin/env python
"""On-chip probe of the sparse Riccati-ADMM path vs the condensed path.

Usage: python tools/probe_riccati_tpu.py [h] [batch] [tile]

Reports chained-scan device marginals (the honest latency on this platform,
see bench.bench_device_marginal) for solver='riccati' and solver='admm',
plus jnp-vs-pallas parity of the riccati backend at a smaller batch.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    import jax
    import jax.numpy as jnp
    from bench import build_inputs, _time, _retry
    from pympc_quadruped_tpu import engine
    from pympc_quadruped_tpu.ops.qp import riccati

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    robot, mpc, x_t, yaw, feet, X_ref, tables = build_inputs(batch, h)
    rcfg = riccati.RiccatiConfig(tile=tile)

    out = {"h": h, "batch": batch, "tile": tile}

    def marginal(solver, K=8, iters=8):
        def chained(k):
            @jax.jit
            def run(x):
                def body(c, _):
                    U = engine.solve_scenarios(
                        robot, mpc, c, yaw, feet, X_ref, tables,
                        solver=solver, riccati_cfg=rcfg,
                    )
                    c2 = c + 1e-6 * jnp.pad(
                        U.reshape(batch, 12), ((0, 0), (0, 1))
                    )[:, :13]
                    return c2, U
                _, Us = jax.lax.scan(body, x, None, length=k)
                return Us
            return run

        t1 = _retry(lambda: _time(chained(1), (x_t,), iters, raw=True),
                    label=f"{solver} K=1")
        tk = _retry(lambda: _time(chained(K), (x_t,), iters, raw=True),
                    label=f"{solver} K={K}")
        diffs = (np.sort(tk) - np.sort(t1)) / (K - 1)
        m50 = float(np.percentile(diffs, 50))
        return {
            "marginal_p50_ms": round(m50 * 1e3, 3),
            "single_call_p50_ms": round(float(np.percentile(t1, 50)) * 1e3, 3),
            "marginal_solves_per_s": round(batch / m50, 1) if m50 > 0 else None,
        }

    t0 = time.time()
    out["riccati"] = marginal("riccati")
    out["riccati_compile_wall_s"] = round(time.time() - t0, 1)
    out["admm_condensed"] = marginal("admm")

    # Parity: pallas kernel vs jnp path on the same small batch.
    Bs = 256
    robot2, mpc2, x2, yaw2, feet2, Xr2, tb2 = build_inputs(Bs, h, seed=7)
    U_pal = np.asarray(_retry(lambda: engine.solve_scenarios(
        robot2, mpc2, x2, yaw2, feet2, Xr2, tb2, solver="riccati",
        riccati_cfg=rcfg)))
    cfg_jnp = rcfg._replace(tile=tile)
    from pympc_quadruped_tpu.ops import srb
    Ad, Bd = jax.vmap(
        lambda y, p: srb.discretize(*srb.state_space(robot2, y, p),
                                    mpc2.dt_predict)
    )(yaw2, feet2)
    U_jnp = np.asarray(riccati.solve_batch(
        Ad, Bd, x2, Xr2, tb2, robot2.fz_max, mpc2, cfg_jnp,
        backend="jnp")[:, :12])
    out["parity_ew_N"] = round(float(np.max(np.abs(U_pal - U_jnp))), 4)
    out["parity_fz_rel"] = round(float(np.max(
        np.abs(U_pal.reshape(Bs, 4, 3)[:, :, 2] - U_jnp.reshape(Bs, 4, 3)[:, :, 2])
        / np.maximum(np.abs(U_jnp.reshape(Bs, 4, 3)[:, :, 2]), 20.0))), 5)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
