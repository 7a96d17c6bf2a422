"""Pallas TPU kernel for the ADMM iteration loop — VMEM-resident operands.

The plain XLA iteration re-reads every scenario's (n,n) ``Kinv`` from HBM on
every one of the ~80 sweeps (batch 4096, h=10: 236 MB x iterations of HBM
traffic — measured bandwidth-bound at ~0.4 ms/iteration).  This kernel tiles
the scenario batch over the grid, loads each tile's operands into VMEM ONCE,
and runs the entire fixed-iteration loop before writing the solution tile
back: HBM traffic drops to a single pass over the operands.

Per grid step (tile of ``T`` scenarios, n = 12h vars, m = 20h rows):

    VMEM residency: Kinv (T,n,n) + P0/P0^T (m,n) + vectors — ~4 MB at
    T=64, h=10 — comfortable against the ~16 MB/core budget including the
    pipeline's double buffering.

    x-update     xt = Kinv @ rhs          batched GEMV (dot_general)
    cone product zt = es * ((d*xt) @ P0^T)  ONE shared (T,n)@(n,m) MXU matmul
    adjoint      A^T v = d * ((es*v) @ P0)  ONE shared (T,m)@(m,n) MXU matmul
    z/y updates  elementwise VPU

The math mirrors :func:`admm_fast.iterate_jnp` exactly (same splitting, same
over-relaxation, the per-variable Ruiz scaling d applied elementwise);
tests assert element-level agreement between the two paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(Kinv_ref, q_ref, d_ref, es_ref, rho_ref, l_ref, u_ref,
            P0T_ref, P0_ref, x0_ref, z0_ref, y0_ref, x_ref, y_ref, *,
            iterations: int, sigma: float, alpha: float):
    Kinv = Kinv_ref[:]            # (T,n,n)
    q = q_ref[:]                  # (T,n)
    d = d_ref[:]                  # (T,n) Ruiz variable scaling
    es = es_ref[:]                # (T,m) row scaling * stance gate
    rho = rho_ref[:]              # (T,m)
    lo = l_ref[:]                 # (T,m)
    hi = u_ref[:]                 # (T,m)
    P0T = P0T_ref[:]              # (n,m)  = P0^T
    P0 = P0_ref[:]                # (m,n)

    T, n = q.shape
    m = es.shape[-1]
    inv_rho = 1.0 / rho

    def body(_, carry):
        x, z, y = carry
        v = es * (rho * z - y)                                   # (T,m)
        rhs = sigma * x - q + d * jnp.dot(
            v, P0, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                        # (T,n)
        xt = jax.lax.dot_general(                                # (T,n)
            Kinv, rhs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        zt = es * jnp.dot(d * xt, P0T, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        x_new = alpha * xt + (1.0 - alpha) * x
        zbar = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(zbar + y * inv_rho, lo, hi)
        y_new = y + rho * (zbar - z_new)
        return x_new, z_new, y_new

    x, _, y = jax.lax.fori_loop(
        0, iterations, body, (x0_ref[:], z0_ref[:], y0_ref[:])
    )
    x_ref[:] = x
    y_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("iterations", "sigma", "alpha", "tile")
)
def _iterate(Kinv, q, d, es, rho, l, u, P0, x0, z0, y0,
             iterations, sigma, alpha, tile):
    B, n = q.shape
    m = es.shape[-1]
    # Largest divisor of B not exceeding the requested tile, so closed-loop
    # callers with arbitrary batch sizes (B=1 single robot, B=12, ...) work
    # without padding; throughput callers use power-of-two batches and get
    # the full tile.
    tile = min(tile, B)
    while B % tile:
        tile -= 1
    kern = functools.partial(
        _kernel, iterations=iterations, sigma=float(sigma), alpha=float(alpha)
    )
    vec = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shared = lambda r, c: pl.BlockSpec(
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec(
                (tile, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            vec(n), vec(n), vec(m), vec(m), vec(m), vec(m),
            shared(n, m), shared(m, n),
            vec(n), vec(m), vec(m),
        ],
        out_specs=(vec(n), vec(m)),
        out_shape=(
            jax.ShapeDtypeStruct((B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, m), jnp.float32),
        ),
    )(Kinv, q, d, es, rho, l, u, P0.T, P0, x0, z0, y0)


def iterate(ops, P0: jnp.ndarray, cfg, init=None):
    """Run the fixed-iteration ADMM loop in one Pallas kernel.

    Returns the SCALED (x, y) pair (B,n)/(B,m), like ``iterate_jnp`` — the
    caller applies the Ruiz unscaling ``x * d`` / ``es * y``.  ``init`` is an
    optional scaled warm start (x0, z0, y0); zeros otherwise.
    """
    B, n = ops.q.shape
    m = ops.es.shape[-1]
    if init is None:
        init = (
            jnp.zeros((B, n), jnp.float32),
            jnp.zeros((B, m), jnp.float32),
            jnp.zeros((B, m), jnp.float32),
        )
    x0, z0, y0 = init
    return _iterate(
        ops.Kinv, ops.q, ops.d, ops.es, ops.rho, ops.l, ops.u, P0,
        x0, z0, y0,
        cfg.iterations, cfg.sigma, cfg.alpha, cfg.tile,
    )
