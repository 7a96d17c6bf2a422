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


def condense(Ad, Bd, x_t, X_ref, mpc: MpcParams):
    """Full condensing for one scenario; vmap over the leading axis to batch."""
    Sx, Su = rollout_matrices(Ad, Bd, mpc.horizon)
    return qp_cost(Sx, Su, x_t, X_ref, mpc)
