"""Pallas TPU kernel for the sparse Riccati-ADMM solve — batch-minor layout.

The condensed kernels (:mod:`admm_pallas`) put the scenario batch on the
LEADING axis and each scenario's (n,n) matrix on the trailing two: right for
MXU GEMVs against 128-lane-wide matrices, but at h=16 the padded 256x256
per-scenario inverse VMEM-starves the pipeline (r4: invert tile 4).

The Riccati path has no big matrices — only chains of 13/12-wide matvecs —
so the right TPU layout is the opposite: **batch on the LANE dimension**.
Every matrix lives as a stack of column (or row) slices shaped (p, B_tile):
a matvec ``y = X v`` is an unrolled sum of broadcast-FMAs

    y (p,B)  +=  X_col_j (p,B)  *  v[j] (1,B)

which the VPU executes on full (sublane, 128-lane) vregs with the batch
filling the lanes.  There are NO dot_generals anywhere: every FLOP is an
exact f32 FMA (the bf16-pass / DEFAULT-precision hazards of the condensed
kernels cannot occur), and the entire solve — Riccati factorization,
12x12 Gauss-Jordan inverses, all ADMM sweeps — runs on VMEM-resident
values inside ONE kernel: the factors (K, M^-1) never exist in HBM.

Layout conventions (all f32, B = lane tile):

    C-form of X (p x q):  (q*p, B), column j at rows [j*p, (j+1)*p)
    R-form of X (p x q):  (q... p*q, B), row i at rows [i*q, (i+1)*q)
    element X[i,j]:       C-form row j*p+i, a (1,B) slice

The XLA-side operand transposes are cheap here because the operands are
tiny (the whole problem is ~2 MB at batch 4096 vs the condensed path's
236 MB Kinv): the relayout war of r3/r4 (see docs/performance.md) was a
big-operand phenomenon.

Math mirrors :mod:`riccati` exactly (same splitting, same over-relaxation);
parity is asserted by tests/test_riccati_pallas.py and the bench KKT
certificate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NS = 13   # states
NU = 12   # inputs
RPL = 5   # cone rows per leg
RPS = 20  # cone rows per step


def _col(X, p, j):
    """Column j of a C-form stack: (p, B)."""
    return X[j * p : (j + 1) * p]


def _row(X, q, i):
    """Row i of an R-form stack: (q, B)."""
    return X[i * q : (i + 1) * q]


def _el(Xc, p, j, i):
    """Element (i, j) from a C-form stack: (1, B)."""
    return Xc[j * p + i : j * p + i + 1]


def _onehot(n, j):
    """(n,1) one-hot column without scatter (Mosaic has no scatter)."""
    io = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return (io == j).astype(jnp.float32)


def _matvec_c(Xc, p, q, v):
    """X @ v from C-form X and a (q,B) vector: (p,B)."""
    acc = _col(Xc, p, 0) * v[0:1]
    for j in range(1, q):
        acc = acc + _col(Xc, p, j) * v[j : j + 1]
    return acc


def _matvec_r(Xr, p, q, v):
    """X^T @ v from R-form X (p x q) and a (p,B) vector: (q,B)."""
    acc = _row(Xr, q, 0) * v[0:1]
    for i in range(1, p):
        acc = acc + _row(Xr, q, i) * v[i : i + 1]
    return acc


def _gj_inverse(Mcols, n):
    """In-place Gauss-Jordan inverse of a batch-minor SPD matrix.

    ``Mcols``: list of n (n,B) column slices.  Returns the inverse as a
    list of n (n,B) columns.  Mirrors admm_fast._gauss_jordan_inv (pivot-
    free — SPD input), vectorized over the column dimension: each pivot is
    n+... broadcast-FMAs on (n,B) tiles plus a one-hot row fixup.
    """
    B = Mcols[0].shape[-1]
    aug = list(Mcols)
    for j in range(n):
        aug.append(jnp.broadcast_to(_onehot(n, j), (n, B)))
    for k in range(n):
        piv = aug[k][k : k + 1]                      # (1,B)
        pivinv = 1.0 / piv
        factors = aug[k]                             # (n,B) column k
        onehot_k = _onehot(n, k)
        new = []
        for j in range(2 * n):
            pr = aug[j][k : k + 1] * pivinv          # (1,B) pivot-row elem
            cj = aug[j] - factors * pr
            cj = cj * (1.0 - onehot_k) + onehot_k * pr
            new.append(cj)
        aug = new
    return aug[n:]


def _solve_kernel(
    Ac_ref, Ar_ref, Bc_ref, Br_ref, hu_ref, mask_ref, q2_ref, mu_ref,
    rho_ref, qx_ref, xt_ref, gate_ref, lo_ref, hi_ref, u0_ref, z0_ref,
    y0_ref, U_ref, Y_ref, *, h: int, iterations: int, sigma: float,
    alpha: float,
):
    Ac, Ar = Ac_ref[:], Ar_ref[:]                    # (169,B) both forms
    Bc, Br = Bc_ref[:], Br_ref[:]                    # (156,B) both forms
    hu = hu_ref[:]                                   # (h*12,B)
    mask = mask_ref[:]                               # (h*12,B)
    q2 = q2_ref[:]                                   # (13,B) = 2*q_diag
    mu = mu_ref[:]                                   # (1,B)
    # Per-scenario ADMM step size on the lane dim (rho normalization,
    # riccati.rho_scale_from_Bd) — broadcasts against every (rows,B) tile.
    rho = rho_ref[:]                                 # (1,B)
    rhoinv = 1.0 / rho
    qx = qx_ref[:]                                   # (h*13,B) = -2Q r_k
    xt = xt_ref[:]                                   # (13,B)
    gate = gate_ref[:]                               # (h*20,B)
    lo, hi = lo_ref[:], hi_ref[:]                    # (h*20,B)
    B = xt.shape[-1]

    # ---------------- Riccati factorization (k = h-1 .. 0) ----------------
    # P is symmetric -> C-form == R-form; carried as a list of 13 columns.
    Pc = [q2[j : j + 1] * _onehot(NS, j) for j in range(NS)]
    Kc_all = [None] * h    # per k: (156,B) C-form (13 cols of (12,B))
    Kr_all = [None] * h    # per k: 12 rows of (13,B)
    Mi_all = [None] * h    # per k: 12 cols of (12,B)

    for k in range(h - 1, -1, -1):
        mk = _row(mask, NU, 0 * NU) if False else mask[k * NU : (k + 1) * NU]
        huk = hu[k * NU : (k + 1) * NU]              # (12,B)

        # PA (13x13) C-form: col j = sum_m P_col_m * A[m,j]
        PAc = []
        for j in range(NS):
            acc = Pc[0] * _el(Ac, NS, j, 0)
            for m in range(1, NS):
                acc = acc + Pc[m] * _el(Ac, NS, j, m)
            PAc.append(acc)
        # PA R-form: row i = sum_m A_row_m * P[m,i]  (P sym: P[m,i]=Pc[i][m])
        PAr = []
        for i in range(NS):
            acc = _row(Ar, NS, 0) * Pc[i][0:1]
            for m in range(1, NS):
                acc = acc + _row(Ar, NS, m) * Pc[i][m : m + 1]
            PAr.append(acc)
        # A^T P A (13x13) C-form: col j = sum_m A_row_m * PA[m,j]
        APAc = []
        for j in range(NS):
            acc = _row(Ar, NS, 0) * PAc[j][0:1]
            for m in range(1, NS):
                acc = acc + _row(Ar, NS, m) * PAc[j][m : m + 1]
            APAc.append(acc)
        # PBk (13x12) C-form with column mask.
        PBc = []
        for j in range(NU):
            acc = Pc[0] * _el(Bc, NS, j, 0)
            for m in range(1, NS):
                acc = acc + Pc[m] * _el(Bc, NS, j, m)
            PBc.append(acc * mk[j : j + 1])
        # M = Hu + Bk^T P Bk (12x12) C-form; row mask folds in as mask*(.).
        Mc = []
        for j in range(NU):
            acc = _row(Br, NU, 0) * PBc[j][0:1]
            for m in range(1, NS):
                acc = acc + _row(Br, NU, m) * PBc[j][m : m + 1]
            Mc.append(acc * mask[k * NU : (k + 1) * NU]
                      + _onehot(NU, j) * huk[j : j + 1])
        Mi = _gj_inverse(Mc, NU)                     # 12 cols of (12,B)
        # G = Bk^T PA (12x13): C-form cols + R-form rows.
        Gc = []
        for j in range(NS):
            acc = _row(Br, NU, 0) * PAc[j][0:1]
            for m in range(1, NS):
                acc = acc + _row(Br, NU, m) * PAc[j][m : m + 1]
            Gc.append(acc * mk)
        Gr = []
        for i in range(NU):
            acc = PAr[0] * (_el(Bc, NS, i, 0) * mk[i : i + 1])
            for m in range(1, NS):
                acc = acc + PAr[m] * (_el(Bc, NS, i, m) * mk[i : i + 1])
            Gr.append(acc)
        # K = M^-1 G (12x13) C-form.
        Kc = []
        for j in range(NS):
            acc = Mi[0] * Gc[j][0:1]
            for m in range(1, NU):
                acc = acc + Mi[m] * Gc[j][m : m + 1]
            Kc.append(acc)
        # K rows: K^T = G^T Minv -> row i = sum_m G_row_m * Minv[m,i].
        Kr = []
        for i in range(NU):
            acc = Gr[0] * Mi[i][0:1]
            for m in range(1, NU):
                acc = acc + Gr[m] * Mi[i][m : m + 1]
            Kr.append(acc)
        # S = G^T K (13x13) C-form: col j = sum_m G_row_m * K[m,j].
        # P_new = 2Q + A^T P A - S.
        Pn = []
        for j in range(NS):
            acc = Gr[0] * Kc[j][0:1]
            for m in range(1, NU):
                acc = acc + Gr[m] * Kc[j][m : m + 1]
            Pn.append(APAc[j] - acc + _onehot(NS, j) * q2[j : j + 1])
        Pc = Pn

        Kc_all[k] = jnp.concatenate(Kc, axis=0)      # (156,B)
        Kr_all[k] = jnp.concatenate(Kr, axis=0)      # (156,B)
        Mi_all[k] = jnp.concatenate(Mi, axis=0)      # (144,B)

    Kc_s = jnp.concatenate(Kc_all, axis=0)           # (h*156,B)
    Kr_s = jnp.concatenate(Kr_all, axis=0)
    Mi_s = jnp.concatenate(Mi_all, axis=0)

    # ------------------------- ADMM iterations ---------------------------
    def cone_fwd(u_all):
        """gate * (P0 @ u) per step: (h*20,B) from (h*12,B)."""
        rows = []
        for k in range(h):
            uk = u_all[k * NU : (k + 1) * NU]
            for leg in range(4):
                fx = uk[3 * leg : 3 * leg + 1]
                fy = uk[3 * leg + 1 : 3 * leg + 2]
                fz = uk[3 * leg + 2 : 3 * leg + 3]
                mfz = mu * fz
                rows.extend([fx + mfz, mfz - fx, fy + mfz, mfz - fy, fz])
        return gate * jnp.concatenate(rows, axis=0)

    def cone_adj(w_all):
        """P0^T @ (gate * w): (h*12,B) from (h*20,B)."""
        out = []
        for k in range(h):
            wk = (gate * w_all)[k * RPS : (k + 1) * RPS]
            for leg in range(4):
                w0 = wk[RPL * leg : RPL * leg + 1]
                w1 = wk[RPL * leg + 1 : RPL * leg + 2]
                w2 = wk[RPL * leg + 2 : RPL * leg + 3]
                w3 = wk[RPL * leg + 3 : RPL * leg + 4]
                w4 = wk[RPL * leg + 4 : RPL * leg + 5]
                out.extend([w0 - w1, w2 - w3, mu * (w0 + w1 + w2 + w3) + w4])
        return jnp.concatenate(out, axis=0)

    def body(_, carry):
        u_prev, z, y = carry
        q_u = cone_adj(y - rho * z) - sigma * u_prev   # (h*12,B)

        # Backward affine sweep: p_h = qx[h-1]; k = h-1..0.
        p = qx[(h - 1) * NS : h * NS]
        d_all = [None] * h
        for k in range(h - 1, -1, -1):
            mk = mask[k * NU : (k + 1) * NU]
            m_k = q_u[k * NU : (k + 1) * NU] + mk * _matvec_r(Br, NS, NU, p)
            Mi_k = Mi_s[k * 144 : (k + 1) * 144]
            d_k = _matvec_c(Mi_k, NU, NU, m_k)
            Kr_k = Kr_s[k * 156 : (k + 1) * 156]
            ktm = _matvec_r(Kr_k, NU, NS, m_k)
            ap = _matvec_r(Ar, NS, NS, p)
            if k >= 1:
                p = qx[(k - 1) * NS : k * NS] + ap - ktm
            else:
                p = ap - ktm                           # p_0 is unused
            d_all[k] = d_k

        # Forward rollout.
        x = xt
        u_rows = []
        for k in range(h):
            Kc_k = Kc_s[k * 156 : (k + 1) * 156]
            u_k = -_matvec_c(Kc_k, NU, NS, x) - d_all[k]
            mk = mask[k * NU : (k + 1) * NU]
            x = _matvec_c(Ac, NS, NS, x) + _matvec_c(Bc, NS, NU, u_k * mk)
            u_rows.append(u_k)
        u_tilde = jnp.concatenate(u_rows, axis=0)      # (h*12,B)

        zt = cone_fwd(u_tilde)
        u_new = alpha * u_tilde + (1.0 - alpha) * u_prev
        zbar = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(zbar + y * rhoinv, lo, hi)
        y_new = y + rho * (zbar - z_new)
        return u_new, z_new, y_new

    carry0 = (u0_ref[:], z0_ref[:], y0_ref[:])
    u_fin, z_fin, y_fin = jax.lax.fori_loop(0, iterations, body, carry0)
    # RAW u out (swing components included): the caller (riccati.solve_batch)
    # owns the masking, exactly like the jnp iterate() path.
    U_ref[:] = u_fin
    Y_ref[:] = y_fin


@functools.partial(
    jax.jit,
    static_argnames=("h", "iterations", "sigma", "alpha", "tile"),
)
def _solve(Ac, Ar, Bc, Br, hu, mask, q2, mu, rho, qx, xt, gate, lo, hi,
           u0, z0, y0, h, iterations, sigma, alpha, tile):
    B = xt.shape[-1]
    assert B % tile == 0, (B, tile)
    kern = functools.partial(
        _solve_kernel, h=h, iterations=iterations,
        sigma=float(sigma), alpha=float(alpha),
    )
    spec = lambda rows: pl.BlockSpec(
        (rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(B // tile,),
        in_specs=[
            spec(NS * NS), spec(NS * NS), spec(NS * NU), spec(NS * NU),
            spec(h * NU), spec(h * NU), spec(NS), spec(1), spec(1),
            spec(h * NS), spec(NS), spec(h * RPS), spec(h * RPS),
            spec(h * RPS), spec(h * NU), spec(h * RPS), spec(h * RPS),
        ],
        out_specs=(spec(h * NU), spec(h * RPS)),
        out_shape=(
            jax.ShapeDtypeStruct((h * NU, B), jnp.float32),
            jax.ShapeDtypeStruct((h * RPS, B), jnp.float32),
        ),
    )(Ac, Ar, Bc, Br, hu, mask, q2, mu, rho, qx, xt, gate, lo, hi,
      u0, z0, y0)


def _pick_tile(B: int, want: int) -> int:
    """Lane tile: ``want`` rounded down to a multiple of 128 (floor 128).

    No divisibility requirement against ``B`` — the caller pads the batch
    UP to a tile multiple, so any 128-multiple works.  (The previous
    largest-divisor loop hit ``B % 0`` for batches that were not tile
    multiples, e.g. B = 130 — the exact case the padding path exists for;
    caught by the TPU-lane ``test_kernel_tpu_matches_jnp[16-130]``.)"""
    del B
    return max(128, (want // 128) * 128)


def factor_iterate(Ad, Bd, x_t, X_ref, hu, m_u, gate, l, u_bnd, mpc, cfg,
                   init=None, rho_b=None):
    """Batch-minor kernel entry mirroring riccati's jnp path signature.

    Batch-major (B, ...) operands in; (B,h,12) U and (B,h,20) y out.  The
    batch is padded up to a lane-tile multiple with IDENTITY problems
    (hu = 1, everything else 0 -> M = I, all sweeps finite) and unpadded
    on return.  ``rho_b``: optional (B,) per-scenario step size (padded
    with 1.0 — any finite positive value keeps the identity pad problems
    finite); default broadcasts ``cfg.rho``.
    """
    B = x_t.shape[0]
    h = mpc.horizon
    tile = _pick_tile(max(B, 128), cfg.tile)
    Bp = ((max(B, tile) + tile - 1) // tile) * tile

    def bm(a, rows):
        """(B, ...) -> padded batch-minor (rows, Bp)."""
        flat = a.reshape(B, rows)
        return jnp.pad(flat, ((0, Bp - B), (0, 0))).T

    Ar = bm(Ad, NS * NS)                                  # row-major flat
    Ac = bm(jnp.swapaxes(Ad, -1, -2), NS * NS)            # col-major flat
    Br = bm(Bd, NS * NU)
    Bc = bm(jnp.swapaxes(Bd, -1, -2), NS * NU)
    hu_m = jnp.pad(hu.reshape(B, h * NU), ((0, Bp - B), (0, 0)),
                   constant_values=1.0).T
    mask_m = bm(m_u, h * NU)
    q2 = jnp.broadcast_to((2.0 * mpc.q_diag)[:, None], (NS, Bp))
    mu_row = jnp.broadcast_to(
        jnp.reshape(mpc.friction_coef, (1, 1)), (1, Bp)
    ).astype(jnp.float32)
    if rho_b is None:
        rho_row = jnp.full((1, Bp), jnp.float32(cfg.rho))
    else:
        rho_row = jnp.pad(
            jnp.asarray(rho_b, jnp.float32)[None, :], ((0, 0), (0, Bp - B)),
            constant_values=1.0,
        )
    qx = bm(-2.0 * mpc.q_diag * X_ref, h * NS)
    xt_m = bm(x_t, NS)
    gate_m = bm(gate, h * RPS)
    lo_m = bm(l, h * RPS)
    # inf upper bounds survive the transpose; pad rows get 0 <= z <= 0.
    hi_m = jnp.pad(u_bnd.reshape(B, h * RPS), ((0, Bp - B), (0, 0))).T
    if init is None:
        u0 = jnp.zeros((h * NU, Bp), jnp.float32)
        z0 = jnp.zeros((h * RPS, Bp), jnp.float32)
        y0 = jnp.zeros((h * RPS, Bp), jnp.float32)
    else:
        u0 = bm(init[0], h * NU)
        z0 = bm(init[1], h * RPS)
        y0 = bm(init[2], h * RPS)

    U, Y = _solve(
        Ac, Ar, Bc, Br, hu_m, mask_m, q2, mu_row, rho_row, qx, xt_m,
        gate_m, lo_m, hi_m, u0, z0, y0, h=h, iterations=int(cfg.iterations),
        sigma=float(cfg.sigma), alpha=float(cfg.alpha), tile=tile,
    )
    U = U.T[:B].reshape(B, h, NU)
    Y = Y.T[:B].reshape(B, h, RPS)
    return U, Y
