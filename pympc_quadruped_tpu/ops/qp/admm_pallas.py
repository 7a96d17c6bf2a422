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

    x, y = _admm_iterations(
        Kinv, q, d, es, rho, lo, hi, P0T, P0,
        x0_ref[:], z0_ref[:], y0_ref[:],
        iterations=iterations, sigma=sigma, alpha=alpha,
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


def _bmm(a, b, prec=_PREC_HI):
    """Batched (T,i,j)@(T,j,k) inside the kernel, f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )


# Precision of the in-kernel Schur-recursion dots (NOT the ADMM iteration
# dots, which stay HIGHEST — r3 measured their quality cliff).  Module-level
# so perf probes can A/B it; the shipping default is HIGHEST.
_PREC_REC = _PREC_HI


def _admm_iterations(Kinv, q, d, es, rho, lo, hi, P0T, P0, x, z, y, *,
                     iterations: int, sigma: float, alpha: float):
    """THE ADMM iteration loop, shared verbatim by every kernel (the same
    math as :func:`admm_fast.iterate_jnp`); traced inline into each
    pallas_call.  Returns the final (x, y)."""
    inv_rho = 1.0 / rho

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

    x, _, y = jax.lax.fori_loop(0, iterations, body, (x, z, y))
    return x, y


def _invert_in_vmem(K, newton_schulz_iters: int):
    """Schur recursion + Newton-Schulz refinement on a VMEM-resident tile —
    the one in-kernel inversion, shared by every kernel that inverts."""
    n = K.shape[-1]
    Kinv = _schur_inv_t(K)
    eye2 = 2.0 * jnp.eye(n, dtype=K.dtype)
    for _ in range(newton_schulz_iters):
        Kinv = _bmm(Kinv, eye2[None] - _bmm(K, Kinv))
        Kinv = 0.5 * (Kinv + jnp.swapaxes(Kinv, -1, -2))
    return Kinv


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


# Gauss-Jordan leaf size of the in-kernel Schur recursion.  Probed on-chip
# in FRESH processes per setting (r4, batch 4096 carried-K invert_spd
# marginals: leaf 8 = 16.0 ms, 16 = 13.3, 32 = 13.3) — 16 and 32 tie, 8
# loses to recursion overhead; 16 keeps the base case smallest.  NOTE for
# probing: this is read at TRACE time and jit caches don't key on it, so
# in-process A/B probes silently reuse the first compilation — change it
# only in a fresh process.
_GJ_LEAF = 16


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
        if n <= _GJ_LEAF:
            return _gj_inv_t(X)
        m = n // 2
        A = X[:, :m, :m]
        Bm = X[:, :m, m:]
        C = X[:, m:, m:]
        Ai = rec(A)
        W = _bmm(Ai, Bm, _PREC_REC)
        S = sym(C - _bmm(jnp.swapaxes(Bm, -1, -2), W, _PREC_REC))
        Si = rec(S)
        WSi = _bmm(W, Si, _PREC_REC)
        TL = sym(Ai + _bmm(WSi, jnp.swapaxes(W, -1, -2), _PREC_REC))
        top = jnp.concatenate([TL, -WSi], axis=-1)
        bot = jnp.concatenate([-jnp.swapaxes(WSi, -1, -2), Si], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    return rec(sym(M))


def _invert_kernel(K_ref, Kinv_ref, *, newton_schulz_iters: int):
    """Standalone SPD inversion on a VMEM-resident tile (same recursion as
    the fused kernel).  Split-pipeline experiments: a Pallas-produced Kinv
    feeds the Pallas iterate kernel in DEFAULT layout, so the r3 XLA->
    custom-call relayout war does not apply to a kernel->kernel handoff."""
    Kinv_ref[:] = _invert_in_vmem(K_ref[:], newton_schulz_iters)


@functools.partial(jax.jit, static_argnames=("tile", "ns_iters"))
def invert_spd(K, tile: int = 16, ns_iters: int = 1):
    """Batched in-VMEM SPD inversion of already-padded (B, n, n) operands
    (n a power-of-two multiple of the 16-leaf; B divisible by the tile).

    Unlike the iterate kernels this one has no 2-D vector blocks, so the
    tile (the leading dim of a 3-D block) needs no multiple-of-8 sublane
    alignment — any divisor of B works, which the big h=16 size needs
    (np_=256: the recursion's scoped VMEM exceeds the 16 MB budget at
    tile 8; tile 4 fits).
    """
    B, n, _ = K.shape
    divisors = [t for t in range(1, B + 1) if B % t == 0]
    below = [t for t in divisors if t <= tile]
    tile = max(below) if below else min(divisors)
    kern = functools.partial(_invert_kernel, newton_schulz_iters=ns_iters)
    return pl.pallas_call(
        kern,
        grid=(B // tile,),
        in_specs=[pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, n), jnp.float32),
    )(K)


def _pad_problem(mat, n: int, tile_want: int, vec_fills: dict, P0=None):
    """The one padding scheme every kernel wrapper shares: append INERT
    scenarios up to a Mosaic-legal batch (identity ``mat``; per-vector fill
    values chosen so the scenario is fully decoupled — gating vectors 0,
    scalings/penalties 1) and pad the primal dimension to the recursion's
    power-of-two size (identity block on ``mat`` — exactly decoupled
    through the Schur recursion; zeros on primal-width vectors and P0
    columns, ones on scalings).

    ``vec_fills``: name -> (array, batch_fill, primal_fill); primal_fill
    None marks an m-width vector (no primal pad).  Returns
    (mat, {name: padded}, P0, np_, Bp).
    """
    B = mat.shape[0]
    np_ = _pow2_pad(n)
    Bp = _pad_batch_to(B, tile_want)
    bpad, pad = Bp - B, np_ - n
    if bpad:
        mat = jnp.concatenate(
            [mat, jnp.broadcast_to(jnp.eye(n, dtype=mat.dtype), (bpad, n, n))],
            axis=0,
        )
    out = {}
    for name, (a, bfill, pfill) in vec_fills.items():
        if bpad:
            a = jnp.concatenate(
                [a, jnp.full((bpad,) + a.shape[1:], bfill, a.dtype)], axis=0
            )
        if pad and pfill is not None:
            a = jnp.pad(a, ((0, 0), (0, pad)), constant_values=pfill)
        out[name] = a
    if pad:
        ii = jnp.arange(np_)
        diag_ext = jnp.where(ii >= n, 1.0, 0.0).astype(mat.dtype)
        mat = jnp.pad(mat, ((0, 0), (0, pad), (0, pad))) + jnp.diag(diag_ext)[None]
        if P0 is not None:
            P0 = jnp.pad(P0, ((0, 0), (0, pad)))
    return mat, out, P0, np_, Bp


def invert_iterate(ops, P0: jnp.ndarray, cfg, init=None,
                   invert_tile: int | None = None):
    """Split two-kernel solve: in-VMEM Schur inversion (small tile — the
    recursion's working set is ~5x the operand) feeding the iteration
    kernel (tile 64 — iteration state is just Kinv + vectors) through a
    kernel->kernel handoff.

    Why this beats the single fused kernel (r4 measured, batch 4096, h=10:
    44.6 ms end-to-end vs 49.1 ms fused): both stages run at THEIR best
    tile instead of sharing the inversion's VMEM-constrained 16, and a
    Pallas-produced operand feeds a Pallas consumer in default layout, so
    the r3 XLA->custom-call relayout war does not reappear at the seam.

    Interface mirrors :func:`iterate_fused`: ``ops`` must be the
    un-inverted :class:`admm_fast.AdmmKktOperands`; returns SCALED (x, y).
    """
    from pympc_quadruped_tpu.ops.qp import admm_fast

    if not isinstance(ops, admm_fast.AdmmKktOperands):
        raise TypeError(
            "invert_iterate needs AdmmKktOperands (setup(invert=False)); "
            f"got {type(ops).__name__}"
        )
    B, n = ops.q.shape
    m = ops.es.shape[-1]
    if init is None:
        init = (
            jnp.zeros((B, n), jnp.float32),
            jnp.zeros((B, m), jnp.float32),
            jnp.zeros((B, m), jnp.float32),
        )
    x0, z0, y0 = init

    K, v, P0, np_, _Bp = _pad_problem(ops.K, n, cfg.tile, {
        "q": (ops.q, 0.0, 0.0), "d": (ops.d, 1.0, 1.0),
        "es": (ops.es, 0.0, None), "rho": (ops.rho, 1.0, None),
        "l": (ops.l, 0.0, None), "u": (ops.u, 1.0, None),
        "x0": (x0, 0.0, 0.0), "z0": (z0, 0.0, None), "y0": (y0, 0.0, None),
    }, P0)
    if invert_tile is None:
        # VMEM scaling rule: the recursion holds ~5x the (tile, np_, np_)
        # operand — 16 at the h=10 size (np_=128), 4 at h=16 (np_=256;
        # tile 8 measured 19 MB > the 16 MB scoped budget there).
        invert_tile = max(2, (16 * 128 * 128) // (np_ * np_))

    Kinv = invert_spd(K, tile=invert_tile, ns_iters=cfg.newton_schulz_iters)
    # The iterate tile scales down with the padded size too (its VMEM
    # residency is Kinv + vectors): 64 at np_=128, 16 at np_=256.
    it_tile = max(8, (cfg.tile * 128 * 128) // (np_ * np_))
    x, y = _iterate(
        Kinv, v["q"], v["d"], v["es"], v["rho"], v["l"], v["u"], P0,
        v["x0"], v["z0"], v["y0"],
        cfg.iterations, cfg.sigma, cfg.alpha, it_tile,
    )
    return x[:B, :n], y[:B]


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

    # ---- invert K in VMEM, then the shared ADMM loop ----
    Kinv = _invert_in_vmem(K, newton_schulz_iters)
    x, y = _admm_iterations(
        Kinv, q, d, es, rho, lo, hi, P0T, P0,
        x0_ref[:], z0_ref[:], y0_ref[:],
        iterations=iterations, sigma=sigma, alpha=alpha,
    )
    x_ref[:] = x
    y_ref[:] = y


# ---------------------------------------------------------------------------
# Fully-fused kernel: Ruiz + K assembly + inversion + iterations (r4)
# ---------------------------------------------------------------------------
#
# r3 moved the Schur inversion into the kernel (the layout war, above).  r4
# moves the REST of the setup in too: the kernel takes the masked condensed
# cost (H, g) straight from build_qp plus the tiny per-row bound vectors, and
# performs Ruiz equilibration, cone-row scaling, K = Hs + A^T rho A + sigma I
# assembly, the in-VMEM inversion, all ADMM iterations, and the final
# unscaling.  Motivation (r3 stage decomposition, docs/performance.md): the
# XLA setup stage (Ruiz fori_loop + block-diag ata einsum + K add) cost ~9 ms
# of the 52 ms pipeline at batch 4096 and a full extra HBM round-trip of the
# (B,n,n) operand; here the scaled matrix never exists in HBM at all.
# The math mirrors admm_fast.setup + iterate_jnp step for step (same
# clipping, same penalties); rounding differs at the reassociation level, so
# parity is gated on the same well-posed invariants as the r3 kernel.


def _full_kernel(H_ref, g_ref, srow_ref, l_ref, u_ref, U0_ref, lam0_ref,
                 P0T_ref, P0_ref, G1_ref, G2_ref, U_ref, lam_ref, *,
                 iterations: int, sigma: float, alpha: float,
                 newton_schulz_iters: int, ruiz_iters: int,
                 rho_ineq: float, rho_eq: float):
    H = H_ref[:]                  # (T,n,n) masked cost, identity-padded
    g = g_ref[:]                  # (T,n)
    srow = srow_ref[:]            # (T,m) stance gate per cone row
    lo_raw = l_ref[:]             # (T,m) unscaled bounds
    hi_raw = u_ref[:]
    U0 = U0_ref[:]                # (T,n) unscaled warm primal (zeros = cold)
    lam0 = lam0_ref[:]            # (T,m) unscaled warm duals
    P0T = P0T_ref[:]              # (n,m)
    P0 = P0_ref[:]                # (m,n)
    G1 = G1_ref[:]                # (n,m) |P0|^T with z-columns zeroed
    G2 = G2_ref[:]                # (n,m) |P0|^T with only z-columns

    T, n = g.shape

    # ---- Ruiz equilibration (mirrors admm_fast.ruiz_scaling) ----
    d = jnp.ones((T, n), jnp.float32)
    Hs = H
    for _ in range(ruiz_iters):
        col = jnp.max(jnp.abs(Hs), axis=-1)
        delta = jnp.clip(jax.lax.rsqrt(jnp.maximum(col, 1e-8)), 1e-4, 1e4)
        Hs = Hs * delta[:, :, None] * delta[:, None, :]
        d = d * delta
    q = g * d

    # ---- cone-row scaling (mirrors admm_fast.pattern_row_norms: each G
    # row has a single nonzero per cone row, so the matmul IS the max's
    # operand — max(dx|dy, mu*dz) elementwise over two exact products) ----
    norms = jnp.maximum(
        jnp.dot(d, G1, preferred_element_type=jnp.float32, precision=_PREC_HI),
        jnp.dot(d, G2, preferred_element_type=jnp.float32, precision=_PREC_HI),
    )
    e = 1.0 / jnp.clip(norms, 1e-8, None)
    es = e * srow
    lo = lo_raw * e
    hi = hi_raw * e
    rho = jnp.where((hi - lo) < 1e-6, rho_eq, rho_ineq)

    # ---- K = Hs + A^T rho A + sigma I with A = diag(es) P0 diag(d):
    # ata = S^T S with S = (sqrt(rho)*es) ⊙ P0 ⊙ d — symmetric by
    # construction, one batched MXU matmul over the m rows ----
    S = (jnp.sqrt(rho) * es)[:, :, None] * P0[None] * d[:, None, :]
    ata = jax.lax.dot_general(
        S, S, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_PREC_HI,
    )
    K = Hs + ata + sigma * jnp.eye(n, dtype=jnp.float32)[None]

    # ---- invert in VMEM (the shared recursion) ----
    Kinv = _invert_in_vmem(K, newton_schulz_iters)

    # ---- warm-start mapping into scaled coordinates (mirrors
    # admm_fast.solve_batch: x0 = U0/d, z0 = clip(es P0 U0, l, u),
    # y0 = lam0/es on gated rows = srow * lam0 * norms) ----
    x = U0 / d
    z = jnp.clip(
        es * jnp.dot(U0, P0T, preferred_element_type=jnp.float32,
                     precision=_PREC_HI),
        lo, hi,
    )
    y = srow * lam0 * norms

    # ---- the shared ADMM loop, then unscale in-kernel ----
    x, y = _admm_iterations(
        Kinv, q, d, es, rho, lo, hi, P0T, P0, x, z, y,
        iterations=iterations, sigma=sigma, alpha=alpha,
    )
    U_ref[:] = x * d
    lam_ref[:] = es * y


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "sigma", "alpha", "tile", "ns_iters",
                     "ruiz_iters", "rho_ineq", "rho_eq"),
)
def _solve_full(H, g, srow, l, u, U0, lam0, P0,
                iterations, sigma, alpha, tile, ns_iters, ruiz_iters,
                rho_ineq, rho_eq):
    B, n = g.shape
    m = srow.shape[-1]
    # Shared inert-scenario + primal-dim padding (identity H: its Ruiz
    # delta is exactly 1 and the block is decoupled through the recursion).
    H, v, P0, np_, Bp = _pad_problem(H, n, tile, {
        "g": (g, 0.0, 0.0), "srow": (srow, 0.0, None),
        "l": (l, 0.0, None), "u": (u, 1.0, None),
        "U0": (U0, 0.0, 0.0), "lam0": (lam0, 0.0, None),
    }, P0)
    g, srow, l, u = v["g"], v["srow"], v["l"], v["u"]
    U0, lam0 = v["U0"], v["lam0"]
    tile = _pick_tile(Bp, tile)

    # Row-norm selector matrices: |P0|^T split into the x/y-coefficient part
    # and the mu*z part; each cone row has at most one nonzero in each, so
    # d @ G1 / d @ G2 reproduce pattern_row_norms exactly.
    zcol = (jnp.arange(np_) % 3 == 2) & (jnp.arange(np_) < n)
    A = jnp.abs(P0)                                           # (m,np_)
    G1 = (A * (~zcol)[None, :]).T                             # (np_,m)
    G2 = (A * zcol[None, :]).T

    kern = functools.partial(
        _full_kernel, iterations=iterations, sigma=float(sigma),
        alpha=float(alpha), newton_schulz_iters=ns_iters,
        ruiz_iters=ruiz_iters, rho_ineq=float(rho_ineq),
        rho_eq=float(rho_eq),
    )
    vec = lambda width: pl.BlockSpec(
        (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    shared = lambda r, c: pl.BlockSpec(
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    U, lam = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec(
                (tile, np_, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            vec(np_), vec(m), vec(m), vec(m), vec(np_), vec(m),
            shared(np_, m), shared(m, np_), shared(np_, m), shared(np_, m),
        ],
        out_specs=(vec(np_), vec(m)),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, np_), jnp.float32),
            jax.ShapeDtypeStruct((Bp, m), jnp.float32),
        ),
    )(H, g, srow, l, u, U0, lam0, P0.T, P0, G1, G2)
    return U[:B, :n], lam[:B]


def solve_full(H, g, srow, l, u, P0: jnp.ndarray, cfg, warm=None,
               fused_tile: int | None = None):
    """One-kernel solve from the raw masked cost: Ruiz + K assembly +
    in-VMEM inversion + iterations + unscaling, HBM traffic = one pass over
    H.  Returns UNSCALED ``(U, lam)`` — unlike iterate/iterate_fused there
    is no scaled coordinate system outside the kernel.

    ``warm`` is the unscaled ``(U0, lam0)`` pair (see
    :func:`admm_fast.solve_batch`); zeros reduce exactly to the cold start.
    """
    B, n = g.shape
    m = srow.shape[-1]
    if warm is None:
        U0 = jnp.zeros((B, n), jnp.float32)
        lam0 = jnp.zeros((B, m), jnp.float32)
    else:
        U0, lam0 = warm
        U0 = jnp.asarray(U0, jnp.float32)
        lam0 = jnp.asarray(lam0, jnp.float32)
    if fused_tile is None:
        np_ = _pow2_pad(n)
        fused_tile = max(8, (16 * 128 * 128) // (np_ * np_))
    return _solve_full(
        H, g, srow, l, u, U0, lam0, P0,
        cfg.iterations, cfg.sigma, cfg.alpha, fused_tile,
        cfg.newton_schulz_iters, cfg.ruiz_iters, cfg.rho, cfg.rho_eq,
    )


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
    """Smallest padded batch >= B whose `_pick_tile` stays <= max(want, 8):
    the next multiple of 8 when B is large but has no mult-of-8 divisor.
    Returns B unchanged when B itself is small (<= max(want, 8)) or already
    has a legal small tile; batches just over the threshold (e.g. B=10,
    want=8) are padded to the next multiple of 8 — harmless extra work that
    keeps every tile Mosaic-legal."""
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
    # Shared inert-scenario + identity primal-dim padding (the padded K
    # block is exactly decoupled through the recursion: off-diagonal blocks
    # are zero, so W = A^-1 B = 0 at every level; zero q/x0 and zero P0
    # columns keep the padded lanes of x inert through every iteration).
    K, v, P0, np_, Bp = _pad_problem(K, n, tile, {
        "q": (q, 0.0, 0.0), "d": (d, 1.0, 1.0),
        "es": (es, 0.0, None), "rho": (rho, 1.0, None),
        "l": (l, 0.0, None), "u": (u, 1.0, None),
        "x0": (x0, 0.0, 0.0), "z0": (z0, 0.0, None), "y0": (y0, 0.0, None),
    }, P0)
    q, d, es, rho, l, u = v["q"], v["d"], v["es"], v["rho"], v["l"], v["u"]
    x0, z0, y0 = v["x0"], v["z0"], v["y0"]
    tile = _pick_tile(Bp, tile)

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
    """Invert-and-iterate in one kernel.  ``ops`` must be the un-inverted
    :class:`admm_fast.AdmmKktOperands` (``admm_fast.setup(invert=False)``).

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
    from pympc_quadruped_tpu.ops.qp import admm_fast

    if not isinstance(ops, admm_fast.AdmmKktOperands):
        raise TypeError(
            "iterate_fused needs AdmmKktOperands (setup(invert=False)); got "
            f"{type(ops).__name__} — route it to iterate()/iterate_jnp()"
        )
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
        ops.K, ops.q, ops.d, ops.es, ops.rho, ops.l, ops.u, P0,
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
    from pympc_quadruped_tpu.ops.qp import admm_fast

    if not isinstance(ops, admm_fast.AdmmOperands):
        raise TypeError(
            "iterate needs AdmmOperands (setup(invert=True)); got "
            f"{type(ops).__name__} — route it to iterate_fused()"
        )
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
