"""QP condensing: (Ad, Bd, x_t, X_ref) -> dense (H, g).

The reference builds ``Sx``/``Su`` with nested Python loops over
O(horizon^2) 13x12 blocks and two dense numpy matmuls (ref
``linear_mpc/mpc.py:211-235``) — its hot loop.  Here the same algebra is
expressed as a handful of batched tensor ops so XLA maps it onto the MXU:

- A-powers via an unrolled scan (horizon is static and small),
- ``Su`` assembled with a single gather over the block-Toeplitz index
  ``i - j`` (no Python-level block loop),
- ``H = 2 (Su^T Qbar Su + Rbar)`` with the diagonal ``Qbar`` folded in as a
  row scaling — one (12h x 13h) @ (13h x 12h) matmul per scenario, batched
  over the scenario axis by ``vmap``.

Prediction structure (doc/linear_mpc.md:516-523):
    X = Sx x_t + Su U,   Sx (13h,13),  Su (13h,12h) lower-block-Toeplitz
    H = 2 (Su^T Qbar Su + Rbar),  g = 2 Su^T Qbar (Sx x_t - X_ref)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import NUM_INPUT, NUM_STATE, MpcParams


def rollout_matrices(Ad: jnp.ndarray, Bd: jnp.ndarray, horizon: int):
    """Build (Sx, Su) for X = Sx x + Su U.

    Returns:
      Sx: (h*13, 13), rows i hold Ad^{i+1}.
      Su: (h*13, h*12), block (i, j) = Ad^{i-j} @ Bd for i >= j else 0.
    """
    prec = jax.lax.Precision.HIGHEST  # powers compound bf16-pass rounding

    def step(P, _):
        P_next = jnp.matmul(P, Ad, precision=prec)
        return P_next, P_next

    eye = jnp.eye(NUM_STATE, dtype=Ad.dtype)
    _, pows = jax.lax.scan(step, eye, None, length=horizon)   # (h,13,13): Ad^1..Ad^h
    all_pows = jnp.concatenate([eye[None], pows], axis=0)      # Ad^0..Ad^h

    Sx = pows.reshape(horizon * NUM_STATE, NUM_STATE)

    # M[k] = Ad^k @ Bd, k = 0..h-1; Su block (i,j) = M[i-j] masked to i>=j.
    M = jnp.einsum("kij,jm->kim", all_pows[:horizon], Bd, precision=prec)  # (h,13,12)
    ii = jnp.arange(horizon)[:, None]
    jj = jnp.arange(horizon)[None, :]
    delta = jnp.clip(ii - jj, 0, horizon - 1)
    blocks = M[delta] * (ii >= jj)[:, :, None, None]           # (h,h,13,12)
    Su = blocks.transpose(0, 2, 1, 3).reshape(
        horizon * NUM_STATE, horizon * NUM_INPUT
    )
    return Sx, Su


def qp_cost(
    Sx: jnp.ndarray,
    Su: jnp.ndarray,
    x_t: jnp.ndarray,
    X_ref: jnp.ndarray,
    mpc: MpcParams,
):
    """Dense condensed cost: H (12h,12h), g (12h,).

    Qbar/Rbar are diagonal (Kronecker of per-step diagonals, ref mpc.py:50-52),
    so they fold into a row scaling instead of explicit 208x208 matrices.
    """
    h = mpc.horizon
    q_bar = jnp.tile(mpc.q_diag, h)          # (13h,)
    r_bar = jnp.tile(mpc.r_diag, h)          # (12h,)

    # Gram form: H = 2 (W^T W + Rbar) with W = sqrt(Qbar) Su.  Computing
    # Su^T Qbar Su directly leaves f32 accumulation asymmetry up to ~3e-3
    # and can make H indefinite (lambda_min < -2R), which derails both the
    # f64 active-set oracle and the f32 IPM (see
    # tests/data/qp_nan_knife_edge.npz).  The Gram product is symmetric up
    # to reduce-order details; the explicit 0.5 (H + H^T) makes it exact.
    # Full-f32 products: TPU matmuls default to one bf16 pass, whose 2^-8
    # rounding on H both breaks the 1e-3 GRF parity bar and (via the
    # near-singular reduced Hessian, lambda_min ~ 2R = 4e-5) can flip H
    # indefinite.  HIGHEST costs 3 MXU passes — negligible at these sizes.
    prec = jax.lax.Precision.HIGHEST
    sqrt_q = jnp.sqrt(q_bar)
    W = Su * sqrt_q[:, None]                 # (13h,12h)
    WtW = jnp.matmul(W.T, W, precision=prec)
    H = WtW + WtW.T + 2.0 * jnp.diag(r_bar)
    g = 2.0 * jnp.matmul(W.T, sqrt_q * (jnp.matmul(Sx, x_t, precision=prec) - X_ref), precision=prec)
    return H, g


def qp_cost_toeplitz(Ad, Bd, x_t, X_ref, mpc: MpcParams):
    """Condensed (H, g) via the block-Toeplitz suffix-sum identity — the
    FLOP-minimal form of the same algebra as :func:`qp_cost`.

    Su is lower-block-Toeplitz (block (i,j) = M_{i-j}, M_k = Ad^k Bd), so

        (Su^T Qbar Su)(j,j') = sum_{i >= max(j,j')} M_{i-j}^T Q M_{i-j'}
                             = S_delta[h-1-j'],   delta = j'-j >= 0,
        S_delta[e] = sum_{c=0..e} M_{c+delta}^T Q M_c   (a cumsum over c).

    Only the h(h+1)/2 unique products T[c+delta, c] are computed (each
    12x13x12) and every suffix sum is a cumsum reuse: ~2.4h x fewer matmul
    FLOPs than the dense (12h)^2 x 13h Gram (24x at h=10).  Summation
    order differs from the Gram, so H agrees to f32 rounding, not bitwise
    — the closed-loop gates are jitter-band behavioral tests and the
    parity path uses :func:`condense_ff`, so only rounding-class effects
    remain.  Symmetry is exact by construction (the lower triangle is the
    transpose of the computed upper blocks).
    """
    h = mpc.horizon
    ni, ns = NUM_INPUT, NUM_STATE
    prec = jax.lax.Precision.HIGHEST

    def step(P, _):
        P_next = jnp.matmul(P, Ad, precision=prec)
        return P_next, P_next

    eye = jnp.eye(ns, dtype=Ad.dtype)
    _, pows = jax.lax.scan(step, eye, None, length=h)
    all_pows = jnp.concatenate([eye[None], pows], axis=0)
    Sx = pows.reshape(h * ns, ns)
    M = jnp.einsum("kij,jm->kim", all_pows[:h], Bd, precision=prec)  # (h,13,12)
    # sqrt(Q) on BOTH sides: the delta=0 diagonal blocks W_c^T W_c are then
    # bitwise symmetric (same products either way), like the Gram form.
    W = jnp.sqrt(mpc.q_diag)[None, :, None] * M                       # (h,13,12)

    # S[delta, e] = cumsum_c W[c+delta]^T W[c]; zero above the anti-edge.
    S = jnp.zeros((h, h, ni, ni), Ad.dtype)
    for delta in range(h):
        prods = jnp.einsum(
            "cij,cik->cjk", W[delta:], W[: h - delta], precision=prec
        )                                                             # (h-delta,12,12)
        S = S.at[delta, : h - delta].set(jnp.cumsum(prods, axis=0))

    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(h)[None, :]
    delta = jnp.clip(jj - ii, 0, h - 1)
    e = h - 1 - jj
    upper = S[delta, e] * (jj >= ii)[:, :, None, None]                # (h,h,12,12)
    # Lower triangle = transpose of the mirrored upper block.
    lower = jnp.swapaxes(S[jnp.clip(ii - jj, 0, h - 1), h - 1 - ii], -1, -2) * (
        (jj < ii)[:, :, None, None]
    )
    Hb = upper + lower
    H = 2.0 * Hb.transpose(0, 2, 1, 3).reshape(h * ni, h * ni) \
        + 2.0 * jnp.diag(jnp.tile(mpc.r_diag, h))

    # g = 2 Su^T Qbar (Sx x - X_ref): correlation of QY with the M stack.
    y = jnp.matmul(Sx, x_t, precision=prec) - X_ref                   # (13h,)
    QY = (jnp.tile(mpc.q_diag, h) * y).reshape(h, ns)                 # (h,13)
    # block j: sum_{i>=j} M_{i-j}^T QY_i
    gb = []
    for j in range(h):
        gb.append(jnp.einsum(
            "cij,ci->j", M[: h - j], QY[j:], precision=prec
        ))
    g = 2.0 * jnp.concatenate(gb)
    return H, g


def condense(Ad, Bd, x_t, X_ref, mpc: MpcParams):
    """Full condensing for one scenario; vmap over the leading axis to batch."""
    Sx, Su = rollout_matrices(Ad, Bd, mpc.horizon)
    return qp_cost(Sx, Su, x_t, X_ref, mpc)


def condense_ff(Ad, Bd, x_t, X_ref, mpc: MpcParams):
    """Float-float condensing for the reference-parity path.

    Plain f32 condensing carries ~1e-7 relative rounding into H whose
    *structure* lands in the reduced Hessian's weak subspace
    (lambda_min ~ 2R = 4e-5, ref R = 1e-5) and moves the QP optimum ~1e-1 —
    measured directly: swapping only the condensing to f64 (same f32 Ad/Bd)
    drops the end-to-end GRF error vs the f64 oracle from 1.2e-1 to 2.5e-6.
    This routine reproduces :func:`condense` in compensated float-float
    arithmetic (ops/ffprec.py error-free transformations; effective
    precision ~1e-14) so a TPU with no f64 ALU meets the BASELINE 1e-3 bar.

    Returns (H_hi, H_lo, g_hi, g_lo); feed the lo parts to the parity IPM's
    compensated-residual refinement.
    """
    from pympc_quadruped_tpu.ops import ffprec

    h = mpc.horizon
    ns, ni = NUM_STATE, NUM_INPUT
    zmat = jnp.zeros((ns, ns), Ad.dtype)

    # A-powers and M_k = Ad^k @ Bd in float-float.
    def step(carry, _):
        P_hi, P_lo = carry
        P_hi, P_lo = ffprec.ff_matmul(P_hi, P_lo, Ad, jnp.zeros_like(Ad))
        return (P_hi, P_lo), (P_hi, P_lo)

    eye = jnp.eye(ns, dtype=Ad.dtype)
    _, (pows_hi, pows_lo) = jax.lax.scan(
        step, (eye, zmat), None, length=h
    )                                                   # Ad^1..Ad^h
    all_hi = jnp.concatenate([eye[None], pows_hi], axis=0)
    all_lo = jnp.concatenate([zmat[None], pows_lo], axis=0)

    Sx_hi = pows_hi.reshape(h * ns, ns)
    Sx_lo = pows_lo.reshape(h * ns, ns)

    M_hi, M_lo = jax.vmap(
        lambda Ph, Pl: ffprec.ff_matmul(Ph, Pl, Bd, jnp.zeros_like(Bd))
    )(all_hi[:h], all_lo[:h])                           # (h,13,12)

    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(h)[None, :]
    delta = jnp.clip(ii - jj, 0, h - 1)
    keep = (ii >= jj)[:, :, None, None]
    Su_hi = (M_hi[delta] * keep).transpose(0, 2, 1, 3).reshape(h * ns, h * ni)
    Su_lo = (M_lo[delta] * keep).transpose(0, 2, 1, 3).reshape(h * ns, h * ni)

    # H = 2 (Su^T Qbar Su + Rbar): Qbar-scaled rows via exact TwoProd.
    q_bar = jnp.tile(mpc.q_diag, h)                     # (13h,) exact f32 data
    QSu_hi, e = ffprec.two_prod(q_bar[:, None], Su_hi)
    QSu_lo = e + q_bar[:, None] * Su_lo
    Ht_hi, Ht_lo = ffprec.ff_matmul(Su_hi.T, Su_lo.T, QSu_hi, QSu_lo)
    # Symmetrize exactly (0.5 is a power of two) and add the R ridge.
    H_hi, H_lo = ffprec.ff_add(
        0.5 * Ht_hi, 0.5 * Ht_lo, 0.5 * Ht_hi.T, 0.5 * Ht_lo.T
    )
    H_hi = 2.0 * H_hi
    H_lo = 2.0 * H_lo
    r_bar = jnp.tile(mpc.r_diag, h)
    ridge = 2.0 * jnp.diag(r_bar)
    H_hi, H_lo = ffprec.ff_add(H_hi, H_lo, ridge)

    # g = 2 Su^T Qbar (Sx x_t - X_ref).
    sx_hi, sx_lo = ffprec.ff_matvec(Sx_hi, x_t, A_lo=Sx_lo)
    d_hi, d_lo = ffprec.ff_add(sx_hi, sx_lo, -X_ref)
    qd_hi, e = ffprec.two_prod(q_bar, d_hi)
    qd_lo = e + q_bar * d_lo
    g_hi, g_lo = ffprec.ff_matvec(Su_hi.T, qd_hi, qd_lo, A_lo=Su_lo.T)
    return H_hi, H_lo, 2.0 * g_hi, 2.0 * g_lo
