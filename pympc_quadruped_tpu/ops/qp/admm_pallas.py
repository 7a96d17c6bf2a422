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
over-relaxation, the per-variable Ruiz scaling d applied elementwise).
Parity with the jnp path is gated on the WELL-POSED invariants (f64 cost,
cone feasibility, predicted-trajectory agreement — bench.py pallas_parity
and the TPU-lane tests): elementwise agreement is ill-posed for this QP's
weak directions, see docs/performance.md.
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
    # Largest Mosaic-legal divisor of B not exceeding the requested tile, so
    # closed-loop callers with arbitrary batch sizes (B=1 single robot,
    # B=12, ...) work without padding; throughput callers use power-of-two
    # batches and get the full tile.
    tile = _pick_tile(B, tile)
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


# ---------------------------------------------------------------------------
# Fused kernel: SPD inversion in VMEM + iteration (r3)
# ---------------------------------------------------------------------------
#
# Motivation (measured, r3 probes): composing the XLA spd_inverse with the
# iteration kernel in ONE program costs ~90 ms of layout damage at batch
# 4096 — XLA lays the Schur recursion's intermediates out batch-minor and
# pays full-size relayout copies (and worse matmul layouts) to feed the
# custom call's default-layout operands; spd_inverse -> pallas measured
# 101 ms vs 34 ms as separate programs.  Feeding K and inverting INSIDE the
# kernel removes the interface entirely: Kinv never exists in HBM, the
# recursion runs on VMEM-resident tiles, and HBM traffic for the whole
# solve drops to one pass over K.

# All in-kernel dots run HIGHEST: a DEFAULT-precision experiment on the
# cone-pattern products (r3) bought only 3% wall while pushing the cost
# gap to 3.2e-5 (gate 2e-5) and cone violations to the gate edge.
_PREC_HI = jax.lax.Precision.HIGHEST


def _bmm(a, b):
    """Batched (T,i,j)@(T,j,k) inside the kernel, f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_PREC_HI,
    )


def _gj_inv_t(M):
    """(T,k,k) Gauss-Jordan inverse, k <= 16, unrolled (VPU elementwise).

    Scatter- and concatenate-free for the Mosaic lowering: the left block L
    (-> I) and right block R (-> M^-1) are carried separately, and the
    pivot-row writeback is a masked ADD — the elimination step zeroes the
    pivot row itself (its factor is the pivot), so adding the normalized row
    back restores it without a scatter.
    """
    k = M.shape[-1]
    L = M
    R = jnp.broadcast_to(jnp.eye(k, dtype=M.dtype), M.shape)
    row_mask = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
    for i in range(k):
        inv_pivot = 1.0 / L[:, i, i][:, None]
        prL = L[:, i, :] * inv_pivot
        prR = R[:, i, :] * inv_pivot
        factors = L[:, :, i]
        keep = jnp.where(row_mask == i, 1.0, 0.0)
        L = L - factors[:, :, None] * prL[:, None, :] + keep * prL[:, None, :]
        R = R - factors[:, :, None] * prR[:, None, :] + keep * prR[:, None, :]
    return R


def _schur_inv_t(M):
    """(T,n,n) SPD inverse via the 2x2 block Schur recursion — the same
    algorithm as :func:`admm_fast.spd_inverse` (same symmetrization for the
    same kappa^2 reasons), but on VMEM-resident values inside the kernel.

    n must be a power of two times the 16-leaf (the caller pads 120 -> 128):
    every slice/concatenate then falls on lane-aligned boundaries, which the
    Mosaic vector layouts require (15/30/60-wide tiles fail to lower).
    """
    def sym(X):
        return 0.5 * (X + jnp.swapaxes(X, -1, -2))

    def rec(X):
        n = X.shape[-1]
        if n <= 16:
            return _gj_inv_t(X)
        m = n // 2
        A = X[:, :m, :m]
        Bm = X[:, :m, m:]
        C = X[:, m:, m:]
        Ai = rec(A)
        W = _bmm(Ai, Bm)
        S = sym(C - _bmm(jnp.swapaxes(Bm, -1, -2), W))
        Si = rec(S)
        WSi = _bmm(W, Si)
        TL = sym(Ai + _bmm(WSi, jnp.swapaxes(W, -1, -2)))
        top = jnp.concatenate([TL, -WSi], axis=-1)
        bot = jnp.concatenate([-jnp.swapaxes(WSi, -1, -2), Si], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    return rec(sym(M))


def _fused_kernel(K_ref, q_ref, d_ref, es_ref, rho_ref, l_ref, u_ref,
                  P0T_ref, P0_ref, x0_ref, z0_ref, y0_ref, x_ref, y_ref, *,
                  iterations: int, sigma: float, alpha: float,
                  newton_schulz_iters: int):
    K = K_ref[:]                  # (T,n,n) scaled KKT matrix (NOT inverted)
    q = q_ref[:]
    d = d_ref[:]
    es = es_ref[:]
    rho = rho_ref[:]
    lo = l_ref[:]
    hi = u_ref[:]
    P0T = P0T_ref[:]
    P0 = P0_ref[:]

    T, n = q.shape
    inv_rho = 1.0 / rho

    # ---- invert K in VMEM ----
    Kinv = _schur_inv_t(K)
    eye2 = 2.0 * jnp.eye(n, dtype=K.dtype)
    for _ in range(newton_schulz_iters):
        Kinv = _bmm(Kinv, eye2[None] - _bmm(K, Kinv))
        Kinv = 0.5 * (Kinv + jnp.swapaxes(Kinv, -1, -2))

    # ---- ADMM iterations (identical math to _kernel) ----
    def body(_, carry):
        x, z, y = carry
        v = es * (rho * z - y)
        rhs = sigma * x - q + d * jnp.dot(
            v, P0, preferred_element_type=jnp.float32, precision=_PREC_HI
        )
        xt = jax.lax.dot_general(
            Kinv, rhs, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_PREC_HI,
        )
        zt = es * jnp.dot(d * xt, P0T, preferred_element_type=jnp.float32,
                          precision=_PREC_HI)
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


def _pick_tile(B: int, want: int) -> int:
    """A Mosaic-legal tile for batch B near ``want``: a divisor of B that
    is a multiple of 8 (sublane requirement for 2-D blocks) or B itself.
    Prefers the largest such divisor <= want; if none exists (e.g. want=4,
    or an odd B), falls back to the smallest legal divisor.  For a large B
    with NO small legal divisor (e.g. 4098 = 2*3*683) even that is the
    whole batch — callers must then batch-pad first (see ``_pad_batch``),
    or the single tile's VMEM footprint explodes."""
    legal = [t for t in range(1, B + 1) if B % t == 0 and (t % 8 == 0 or t == B)]
    below = [t for t in legal if t <= want]
    return max(below) if below else min(legal)


def _pad_batch_to(B: int, want: int) -> int:
    """Smallest padded batch >= B whose `_pick_tile` stays <= max(want, B):
    the next multiple of 8 when B is large but has no mult-of-8 divisor.
    Returns B unchanged when no padding is needed."""
    if B <= max(want, 8) or _pick_tile(B, want) <= max(want, 8):
        return B
    return ((B + 7) // 8) * 8


def _pow2_pad(n: int, leaf: int = 16) -> int:
    """Smallest leaf * 2^k >= n (120 -> 128): the in-kernel recursion needs
    lane-aligned block boundaries at every level."""
    p = leaf
    while p < n:
        p *= 2
    return p


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "sigma", "alpha", "tile", "ns_iters"),
)
def _iterate_fused(K, q, d, es, rho, l, u, P0, x0, z0, y0,
                   iterations, sigma, alpha, tile, ns_iters):
    B, n = q.shape
    m = es.shape[-1]
    # Batch padding for Mosaic-illegal batch sizes (large B with no
    # multiple-of-8 divisor, e.g. 4098): append identity-K scenarios whose
    # gated rows (es = 0) and zeroed vectors make them inert, then slice
    # the outputs back.
    Bp = _pad_batch_to(B, tile)
    bpad = Bp - B
    if bpad:
        eyeK = jnp.broadcast_to(
            jnp.eye(K.shape[-1], dtype=K.dtype), (bpad,) + K.shape[1:]
        )
        K = jnp.concatenate([K, eyeK], axis=0)
        zb = lambda a: jnp.pad(a, ((0, bpad),) + ((0, 0),) * (a.ndim - 1))
        q, d, es, l, u, x0, z0, y0 = map(zb, (q, d, es, l, u, x0, z0, y0))
        rho = jnp.concatenate(
            [rho, jnp.ones((bpad, rho.shape[-1]), rho.dtype)], axis=0
        )
    tile = _pick_tile(Bp, tile)

    # Pad the primal dimension to a recursion-friendly power-of-two size.
    # K gains an identity block (its inverse is exact and decoupled:
    # off-diagonal blocks are exactly zero, so W = A^-1 B = 0 through the
    # recursion); q/d/x0/P0-columns gain zeros, which keeps the padded
    # lanes of x identically zero through every iteration.
    np_ = _pow2_pad(n)
    pad = np_ - n
    if pad:
        ii = jnp.arange(np_)
        diag_ext = jnp.where(ii >= n, 1.0, 0.0).astype(K.dtype)
        K = jnp.pad(K, ((0, 0), (0, pad), (0, pad))) + jnp.diag(diag_ext)[None]
        zpad = lambda a: jnp.pad(a, ((0, 0), (0, pad)))
        q, d, x0 = zpad(q), zpad(d), zpad(x0)
        P0 = jnp.pad(P0, ((0, 0), (0, pad)))

    kern = functools.partial(
        _fused_kernel, iterations=iterations, sigma=float(sigma),
        alpha=float(alpha), newton_schulz_iters=ns_iters,
    )
    vec = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shared = lambda r, c: pl.BlockSpec(
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    x, y = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec(
                (tile, np_, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            vec(np_), vec(np_), vec(m), vec(m), vec(m), vec(m),
            shared(np_, m), shared(m, np_),
            vec(np_), vec(m), vec(m),
        ],
        out_specs=(vec(np_), vec(m)),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, np_), jnp.float32),
            jax.ShapeDtypeStruct((Bp, m), jnp.float32),
        ),
    )(K, q, d, es, rho, l, u, P0.T, P0, x0, z0, y0)
    return x[:B, :n], y[:B]


def iterate_fused(ops, P0: jnp.ndarray, cfg, init=None,
                  fused_tile: int | None = None):
    """Invert-and-iterate in one kernel.  ``ops.Kinv`` must hold the
    UN-inverted scaled KKT matrix K (``admm_fast.setup(..., invert=False)``).

    ``fused_tile`` defaults by problem size: the in-kernel recursion holds
    K, Kinv and the level temporaries at once (~5x the iterate-only working
    set per scenario), and the kernel's VMEM stack grows with
    ``tile * n_pad^2`` — 16 scenarios/tile at the h=10 size (n_pad = 128;
    measured best of {8,16,24,32}: 8 = 64.6 ms, 16 = 52.0, 24 = 52.6, 32
    blows the 16 MB scoped-VMEM budget) and scaled down by
    ``(128/n_pad)^2`` beyond, floored at the sublane-minimum 8 (h=16's
    n_pad = 256 compiles and passes parity at tile 8 on v5e — the stack
    does not scale purely as tile*n_pad^2).
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
    if fused_tile is None:
        np_ = _pow2_pad(n)
        fused_tile = max(8, (16 * 128 * 128) // (np_ * np_))
    return _iterate_fused(
        ops.Kinv, ops.q, ops.d, ops.es, ops.rho, ops.l, ops.u, P0,
        x0, z0, y0,
        cfg.iterations, cfg.sigma, cfg.alpha, fused_tile,
        cfg.newton_schulz_iters,
    )


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
