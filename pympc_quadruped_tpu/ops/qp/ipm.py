"""Batched Mehrotra predictor-corrector interior-point QP solver.

Replaces the reference's Drake ``MathematicalProgram``/OSQP solve
(ref ``linear_mpc/mpc.py:277-290``) with a fixed-iteration primal-dual
interior-point method designed for TPU lockstep batching:

- **fixed iteration count** — every scenario in a batch executes the same
  instruction stream; no data-dependent control flow, predictable p99;
- **structured constraints** — the friction cones enter only through
  per-block einsums and a block-diagonal normal-matrix update
  (:mod:`pympc_quadruped_tpu.ops.qp.cones`), so the per-iteration cost is
  one batched (n x n) Cholesky plus small matvecs;
- **swing-leg masking** — equality-constrained (swing) forces are pinned by
  cost masking, keeping a strict interior for the remaining cone rows;
- **float32-safe barrier** — slack/multiplier floors and a cap on the
  scaling matrix D = diag(lam/s) keep post-convergence iterations finite in
  f32 (without them, s collapses to ~1e-10 and the rhs scaling overflows);
- **optional float-float refinement** — the reference QP is near-degenerate
  (reduced-Hessian lambda_min ~ 2R = 4e-5), so f32 rounding in the dual
  residual shifts the optimum by up to ~1e-1 N along internal-force
  directions.  With ``refine_iters > 0`` the final iterations recompute the
  dual residual with compensated (double-single) arithmetic
  (:mod:`pympc_quadruped_tpu.ops.ffprec`), recovering ~1e-6-level parity
  with a float64 oracle on identical data.  Throughput paths leave it off;
  single-scenario reference-parity paths turn it on.

Role note — why the per-iteration Cholesky stays, and why this solver is
not the production default: a matmul-only KKT solve (the blocked Schur
inverse from :mod:`admm_fast` + iterative refinement) was measured on the
trot QP family and rejected.  The barrier matrix M = H + G^T D G spans
kappa ~ d_max even after Jacobi scaling, the f32 Schur inverse lands at
~1e-1 relative residual there, refinement contracts by that same factor per
step and stalls: cost gap ~2e-4 of scale vs ~1e-8 for Cholesky (6 refinement
steps, NS=2, measured 4 gait phases).  The fast ADMM beats this IPM on BOTH
throughput and cost gap, so every closed-loop/throughput surface defaults to
``admm_fast``; this solver is the accuracy/parity path (with float-float
refinement) and an independent algorithmic cross-check, where the Cholesky's
sequential-scalar cost is acceptable.

Solves:  min 1/2 x^T H x + g^T x   s.t.  G x <= h     (per-block structure)

Newton systems use the standard slack elimination:

    (H + G^T diag(lam/s) G) dx = -r_d - G^T((lam*r_p - r_c)/s)
    ds = -r_p - G dx
    dlam = (-r_c - lam*ds)/s
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.ops import ffprec
from pympc_quadruped_tpu.ops.qp import cones


class IpmConfig(NamedTuple):
    iterations: int = 18
    refine_iters: int = 0       # extra iterations with compensated residuals
    tau: float = 0.99           # fraction-to-boundary
    jitter: float = 1.0e-6      # relative Cholesky regularization
    s_floor: float = 1.0e-6
    lam_floor: float = 1.0e-7
    d_max: float = 1.0e6        # cap on lam/s barrier scaling
    s_init: float = 1.0
    lam_init: float = 1.0


def _pos_step(z: jnp.ndarray, dz: jnp.ndarray) -> jnp.ndarray:
    """Largest alpha in (0,1] with z + alpha dz >= 0 (per scenario)."""
    ratio = jnp.where(dz < 0.0, -z / jnp.where(dz < 0.0, dz, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio))


def _solve_single(H, g, G, h_vec, cfg: IpmConfig, H_lo=None, g_lo=None):
    """One scenario. H (n,n), g (n,), G (h,4,6,3), h_vec (h,4,6).

    Optional H_lo/g_lo are float-float low words of the problem data (from
    ``condense.condense_ff``), consumed only by the refinement residual.
    """
    n = g.shape[0]
    m = h_vec.size
    h_flat = h_vec.reshape(-1)
    # Dense constraint matrix for the compensated-residual path only
    # (refinement needs an (m, n) @ for ff accumulation; built lazily by XLA
    # and dead-code-eliminated when refine_iters == 0).
    diag_scale = jnp.mean(jnp.diag(H))
    eye = jnp.eye(n, dtype=H.dtype)

    def newton_step(x, s, lam, r_d):
        """Shared predictor-corrector step given a dual residual r_d."""
        Gx = cones.block_matvec(G, x).reshape(-1)
        r_p = Gx + s - h_flat
        mu = jnp.dot(s, lam) / m

        d = jnp.minimum(lam / s, cfg.d_max).reshape(h_vec.shape)
        M = H + cones.block_normal_matrix(G, d) + (cfg.jitter * diag_scale) * eye
        # Jacobi scaling: the barrier term makes diag(M) span ~11 orders of
        # magnitude near convergence, far beyond what a float32 Cholesky
        # tolerates.  Scaling to unit diagonal restores kappa to the
        # problem's structural conditioning.
        dsi = jax.lax.rsqrt(jnp.maximum(jnp.diag(M), 1e-30))
        M_scaled = M * dsi[:, None] * dsi[None, :]
        chol = jnp.linalg.cholesky(M_scaled + cfg.jitter * eye)

        def kkt_solve(r_c):
            rhs = -r_d - cones.block_rmatvec(
                G, ((lam * r_p - r_c) / s).reshape(h_vec.shape)
            )
            dx = dsi * jax.scipy.linalg.cho_solve((chol, True), dsi * rhs)
            ds = -r_p - cones.block_matvec(G, dx).reshape(-1)
            dlam = (-r_c - lam * ds) / s
            return dx, ds, dlam

        dx_a, ds_a, dlam_a = kkt_solve(s * lam)
        alpha_a = jnp.minimum(_pos_step(s, ds_a), _pos_step(lam, dlam_a))
        mu_aff = jnp.dot(s + alpha_a * ds_a, lam + alpha_a * dlam_a) / m
        sigma = (jnp.maximum(mu_aff, 1e-12) / jnp.maximum(mu, 1e-9)) ** 3

        r_c = s * lam + ds_a * dlam_a - sigma * mu
        dx, ds, dlam = kkt_solve(r_c)
        alpha = cfg.tau * jnp.minimum(_pos_step(s, ds), _pos_step(lam, dlam))
        alpha = jnp.minimum(alpha, 1.0)

        # Finite-step guard: near convergence the f32 Cholesky sits on a
        # knife-edge (scaled pivots ~ sqrt(eps_f32)); a bad rounding makes a
        # pivot negative and NaN-poisons the whole step.  Rejecting the step
        # (alpha = 0, keep the last good iterate) is the lockstep-safe
        # fallback — by that point mu has already converged, and the next
        # iteration simply re-attempts from the same point.  Regression
        # fixture: tests/data/qp_nan_knife_edge.npz (closed-loop Aliengo
        # trot, solve tick 180, f32 scan build).
        ok = (
            jnp.all(jnp.isfinite(dx))
            & jnp.all(jnp.isfinite(ds))
            & jnp.all(jnp.isfinite(dlam))
        )
        zero = jnp.zeros((), H.dtype)
        dx = jnp.where(ok, dx, zero)
        ds = jnp.where(ok, ds, zero)
        dlam = jnp.where(ok, dlam, zero)
        alpha = jnp.where(ok, alpha, zero)

        x = x + alpha * dx
        s = jnp.maximum(s + alpha * ds, cfg.s_floor)
        lam = jnp.maximum(lam + alpha * dlam, cfg.lam_floor)
        return x, s, lam

    # ---- phase 1: plain float32 iterations ---------------------------
    x = jnp.zeros((n,), H.dtype)
    s = jnp.maximum(h_flat, cfg.s_init)
    lam = jnp.full((m,), cfg.lam_init, H.dtype)

    def body(carry, _):
        x, s, lam = carry
        r_d = H @ x + g + cones.block_rmatvec(G, lam.reshape(h_vec.shape))
        x, s, lam = newton_step(x, s, lam, r_d)
        return (x, s, lam), None

    (x, s, lam), _ = jax.lax.scan(body, (x, s, lam), None, length=cfg.iterations)

    # ---- phase 2: compensated-residual refinement --------------------
    if cfg.refine_iters > 0:
        # Dense (n, m) G^T via the block layout, for ff accumulation.
        hsteps = h_vec.shape[0]
        blocks = G.reshape(hsteps * 4, 6, 3)
        idx = jnp.arange(hsteps * 4)
        GT_full = jnp.zeros((hsteps * 4, 3, hsteps * 4, 6), H.dtype)
        GT_full = GT_full.at[idx, :, idx, :].set(blocks.transpose(0, 2, 1))
        GT_dense = GT_full.reshape(n, m)

        def refine_body(carry, _):
            x_hi, x_lo, s, lam = carry
            # r_d = H x + g + G^T lam with float-float accumulation.  When
            # the caller condensed in float-float (condense_ff), H_lo/g_lo
            # carry the data's low words so the residual sees the full-
            # precision problem, not its f32 rounding.
            hx_hi, hx_lo = ffprec.ff_matvec(H, x_hi, x_lo, A_lo=H_lo)
            gl_hi, gl_lo = ffprec.ff_matvec(GT_dense, lam)
            r_hi, r_lo = ffprec.ff_add(hx_hi, hx_lo, g, g_lo)
            r_hi, r_lo = ffprec.ff_add(r_hi, r_lo, gl_hi, gl_lo)
            r_d = ffprec.ff_to_f32(r_hi, r_lo)

            x_new, s, lam = newton_step(ffprec.ff_to_f32(x_hi, x_lo), s, lam, r_d)
            # Store x as float-float to keep representation error sub-1e-6.
            dx = x_new - ffprec.ff_to_f32(x_hi, x_lo)
            x_hi, x_lo = ffprec.ff_add(x_hi, x_lo, dx)
            return (x_hi, x_lo, s, lam), None

        x_lo = jnp.zeros_like(x)
        (x, x_lo, s, lam), _ = jax.lax.scan(
            refine_body, (x, x_lo, s, lam), None, length=cfg.refine_iters
        )
        x = ffprec.ff_to_f32(x, x_lo)

    return x


def solve_batch(H, g, G, h_vec, cfg: IpmConfig = IpmConfig(), H_lo=None, g_lo=None):
    """Batched solve. Leading axis of every argument is the scenario batch.

    Returns x* (B, n).  All scenarios run the same fixed iteration count in
    lockstep; accuracy is validated against a float64 oracle in
    ``tests/test_qp.py``.  Pass H_lo/g_lo (float-float data low words) for
    the full-precision parity path.
    """
    if H_lo is None:
        return jax.vmap(lambda H_, g_, G_, h_: _solve_single(H_, g_, G_, h_, cfg))(
            H, g, G, h_vec
        )
    return jax.vmap(
        lambda H_, g_, G_, h_, Hl, gl: _solve_single(H_, g_, G_, h_, cfg, Hl, gl)
    )(H, g, G, h_vec, H_lo, g_lo)


# Preset for reference-parity paths: extra compensated-residual iterations.
PARITY_CONFIG = IpmConfig(iterations=18, refine_iters=12)
