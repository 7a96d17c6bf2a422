"""Friction-cone constraint structure for the condensed MPC QP.

The reference materializes a dense (5*4h x 12h) constraint matrix as a
Kronecker product and hands it to Drake/OSQP (ref ``linear_mpc/mpc.py:237-260``).
The TPU design instead keeps the *block* structure explicit: every
(horizon-step, leg) pair owns an independent 3-vector of forces constrained by

    |fx| <= mu * fz,   |fy| <= mu * fz,   0 <= fz <= gait * fz_max

so constraint products factor into per-block (6x3) einsums and the IPM normal
matrix gets only a block-diagonal update — no 320x192 dense matrix ever exists.

Swing legs (gait table = 0) make the reference's bounds an implicit equality
``f = 0`` (0 <= fz <= 0 plus the cone rows).  An equality written as two
inequalities has no strict interior, which breaks interior-point methods, so
we *pin* swing-leg variables instead: the cost is masked so each swing force
sees an identity quadratic with zero gradient (optimum exactly 0 — identical
to the reference's optimum) and its cone rows are replaced by the trivially
inactive ``0 <= 1``.  This keeps shapes static and every scenario in lockstep
regardless of which legs are swinging — gait gating is data, not structure.

Row layout per block (h_vec gives the right-hand side of G f <= h):

    row 0:  -fx - mu fz <= 0
    row 1:   fx - mu fz <= 0
    row 2:  -fy - mu fz <= 0
    row 3:   fy - mu fz <= 0
    row 4:  -fz         <= 0
    row 5:   fz         <= fz_max   (stance)   /  0 <= 1  (swing)
"""
from __future__ import annotations

import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import MpcParams

CONE_ROWS_PER_BLOCK = 6


def _cone_rows(mu: jnp.ndarray) -> jnp.ndarray:
    """(6,3) stance-block constraint rows for G f <= h."""
    one = jnp.ones_like(mu)
    zero = jnp.zeros_like(mu)
    return jnp.stack(
        [
            jnp.stack([-one, zero, -mu]),
            jnp.stack([one, zero, -mu]),
            jnp.stack([zero, -one, -mu]),
            jnp.stack([zero, one, -mu]),
            jnp.stack([zero, zero, -one]),
            jnp.stack([zero, zero, one]),
        ]
    )


def block_constraints(gait_table: jnp.ndarray, fz_max: jnp.ndarray, mpc: MpcParams):
    """Build per-block constraint tensors from the stance table.

    Args:
      gait_table: (4h,) stance flags in (step, leg) row-major order.

    Returns:
      G: (h, 4, 6, 3) per-block rows (zeroed for swing blocks).
      h_vec: (h, 4, 6) right-hand sides.
      stance: (h, 4) stance mask as float32.
    """
    h = mpc.horizon
    stance = gait_table.reshape(h, 4)
    rows = _cone_rows(mpc.friction_coef)                       # (6,3)
    G = rows[None, None] * stance[:, :, None, None]            # (h,4,6,3)
    h_stance = jnp.zeros((CONE_ROWS_PER_BLOCK,), jnp.float32).at[5].set(fz_max)
    h_vec = jnp.where(
        stance[:, :, None] > 0.0,
        jnp.broadcast_to(h_stance, (h, 4, CONE_ROWS_PER_BLOCK)),
        1.0,
    )
    return G, h_vec, stance


def variable_mask(gait_table: jnp.ndarray, mpc: MpcParams) -> jnp.ndarray:
    """(12h,) 1.0 for stance-controlled force components, 0.0 for swing."""
    return jnp.repeat(gait_table.reshape(mpc.horizon * 4), 3)


def mask_cost(H: jnp.ndarray, g: jnp.ndarray, mv: jnp.ndarray):
    """Pin masked variables at 0: masked rows/cols of H become identity with
    zero gradient, so the masked optimum equals the reference's (swing f = 0)."""
    Hm = H * mv[:, None] * mv[None, :] + jnp.diag(1.0 - mv)
    gm = g * mv
    return Hm, gm


def block_matvec(G: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """G @ x using block structure: x (12h,) -> (h,4,6)."""
    h = G.shape[0]
    xb = x.reshape(h, 4, 3)
    return jnp.einsum("hlrc,hlc->hlr", G, xb)


def block_rmatvec(G: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """G^T @ y using block structure: y (h,4,6) -> (12h,)."""
    h = G.shape[0]
    out = jnp.einsum("hlrc,hlr->hlc", G, y)
    return out.reshape(h * 12)


def block_normal_matrix(G: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """G^T diag(d) G as a dense (12h,12h) block-diagonal matrix.

    d: (h,4,6) positive row weights.  Only the 3x3 diagonal blocks are
    nonzero; they are computed with one einsum and scattered in place.
    """
    h = G.shape[0]
    blocks = jnp.einsum("hlrc,hlr,hlrd->hlcd", G, d, G)       # (h,4,3,3)
    n_blk = h * 4
    flat = blocks.reshape(n_blk, 3, 3)
    out = jnp.zeros((n_blk, 3, n_blk, 3), dtype=G.dtype)
    idx = jnp.arange(n_blk)
    out = out.at[idx, :, idx, :].set(flat)
    return out.reshape(n_blk * 3, n_blk * 3)
