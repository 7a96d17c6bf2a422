"""Batched OSQP-style ADMM QP solver — the matmul-only throughput path.

A fixed-iteration operator-splitting solver in the spirit of OSQP (and of
ReLU-QP's GPU formulation): after a single factorization-free setup step, the
whole iteration is ``x = Kinv @ rhs`` batched matmuls plus elementwise
clipping — exactly the shape of work the MXU is built for.  No per-iteration
factorization, no data-dependent control flow.

Solves the reference's condensed problem in its native double-sided form
(ref ``linear_mpc/mpc.py:237-260``):

    min 1/2 x^T H x + g^T x   s.t.  l <= A x <= u

with A the block-diagonal friction-pyramid matrix (5 rows per
(step, leg) block: fx +- mu fz >= 0, fy +- mu fz >= 0, 0 <= fz <= gait*fz_max).
Swing-leg variables are pinned by cost masking, same as the IPM path.

Iteration (over-relaxed ADMM, rho-weighted):

    K = H + sigma I + A^T diag(rho) A          (SPD; inverted once, batched)
    xt   = Kinv (sigma x - g + A^T (rho z - y))
    zt   = A xt
    x+   = alpha xt + (1-alpha) x
    zbar = alpha zt + (1-alpha) z
    z+   = clip(zbar + y/rho, l, u)
    y+   = y + rho (zbar - z+)

The explicit inverse is computed from a Cholesky factorization; with the
``sigma`` shift and rho-regularization K is well-conditioned in float32.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import MpcParams

ADMM_ROWS_PER_BLOCK = 5


class AdmmConfig(NamedTuple):
    # Defaults tuned on trot-family condensed QPs (see tests/test_qp.py):
    # the tiny reference input weight R = 1e-5 makes kappa(H) ~ 1e5, which
    # favors a small rho and strong over-relaxation.
    iterations: int = 250
    rho: float = 0.003         # penalty on inequality rows
    rho_eq: float = 3.0        # boosted penalty where l == u (tight bounds)
    sigma: float = 1.0e-6
    alpha: float = 1.8         # over-relaxation


def pyramid_rows(mu: jnp.ndarray) -> jnp.ndarray:
    """(5,3) reference cone rows, l <= rows @ f <= u (ref mpc.py:239-245)."""
    one = jnp.ones_like(mu)
    zero = jnp.zeros_like(mu)
    return jnp.stack(
        [
            jnp.stack([one, zero, mu]),
            jnp.stack([-one, zero, mu]),
            jnp.stack([zero, one, mu]),
            jnp.stack([zero, -one, mu]),
            jnp.stack([zero, zero, one]),
        ]
    )


def admm_constraints(gait_table: jnp.ndarray, fz_max: jnp.ndarray, mpc: MpcParams):
    """Per-block A (h,4,5,3), l (h,4,5), u (h,4,5) for the ADMM splitting.

    Swing blocks get zeroed rows with l = 0, u = 1 (trivially satisfied by
    z = 0); their variables are pinned by the cost mask instead.
    """
    h = mpc.horizon
    stance = gait_table.reshape(h, 4)
    rows = pyramid_rows(mpc.friction_coef)
    A = rows[None, None] * stance[:, :, None, None]
    inf = jnp.float32(jnp.inf)
    u_stance = jnp.stack(
        [inf, inf, inf, inf, jnp.asarray(fz_max, jnp.float32)]
    )
    u = jnp.where(
        stance[:, :, None] > 0.0,
        jnp.broadcast_to(u_stance, (h, 4, ADMM_ROWS_PER_BLOCK)),
        1.0,
    )
    l = jnp.zeros((h, 4, ADMM_ROWS_PER_BLOCK), jnp.float32)
    return A, l, u


def _solve_single(H, g, A, l, u, cfg: AdmmConfig):
    n = g.shape[0]
    hsteps = A.shape[0]
    l_flat, u_flat = l.reshape(-1), u.reshape(-1)

    # Per-row rho: boost near-equality rows (the z = 0 vertical bound of a
    # stance foot about to lift, or any l == u row), OSQP-style.
    tight = (u_flat - l_flat) < 1e-6
    rho = jnp.where(tight, cfg.rho_eq, cfg.rho)

    def amat(x):
        return jnp.einsum("hlrc,hlc->hlr", A, x.reshape(hsteps, 4, 3)).reshape(-1)

    def atmat(y):
        return jnp.einsum(
            "hlrc,hlr->hlc", A, y.reshape(hsteps, 4, ADMM_ROWS_PER_BLOCK)
        ).reshape(-1)

    # A^T diag(rho) A is block-diagonal; assemble it densely once.
    rho_blocks = rho.reshape(hsteps, 4, ADMM_ROWS_PER_BLOCK)
    ata = jnp.einsum("hlrc,hlr,hlrd->hlcd", A, rho_blocks, A)  # (h,4,3,3)
    n_blk = hsteps * 4
    big = jnp.zeros((n_blk, 3, n_blk, 3), H.dtype)
    idx = jnp.arange(n_blk)
    big = big.at[idx, :, idx, :].set(ata.reshape(n_blk, 3, 3))
    K = H + cfg.sigma * jnp.eye(n, dtype=H.dtype) + big.reshape(n, n)

    chol = jnp.linalg.cholesky(K)
    Kinv = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(n, dtype=H.dtype))

    x = jnp.zeros((n,), H.dtype)
    z = jnp.zeros_like(l_flat)
    y = jnp.zeros_like(l_flat)

    def body(carry, _):
        x, z, y = carry
        rhs = cfg.sigma * x - g + atmat(rho * z - y)
        xt = Kinv @ rhs
        zt = amat(xt)
        x_new = cfg.alpha * xt + (1.0 - cfg.alpha) * x
        zbar = cfg.alpha * zt + (1.0 - cfg.alpha) * z
        z_new = jnp.clip(zbar + y / rho, l_flat, u_flat)
        y_new = y + rho * (zbar - z_new)
        return (x_new, z_new, y_new), None

    (x, z, y), _ = jax.lax.scan(body, (x, z, y), None, length=cfg.iterations)
    return x


def solve_batch(H, g, A, l, u, cfg: AdmmConfig = AdmmConfig()):
    """Batched ADMM solve; every argument carries a leading scenario axis."""
    return jax.vmap(lambda H_, g_, A_, l_, u_: _solve_single(H_, g_, A_, l_, u_, cfg))(
        H, g, A, l, u
    )
