"""O(horizon) sparse Riccati-ADMM solver for the MPC QP — the h=16 path.

The condensed formulation (``ops/condense.py`` + ``ops/qp/admm_fast.py``)
eliminates the states and hands ADMM a dense (12h x 12h) Hessian.  At the
reference's own default horizon 16 (ref ``config/linear_mpc_configs.py:11``,
192-var QP, ref ``linear_mpc/mpc.py:232``) that dense form pads 192 -> 256
lanes and VMEM-starves the kernels: every iteration is a GEMV against a
256 KB-per-scenario inverse, and the Schur inversion drops to batch tile 4
(r4: h16 ran 2.9x slower than h10).

This module keeps the states: the same OSQP-style operator splitting, but
the x-update is the equality-constrained LQR

    min  sum_k (x_k - r_k)^T Q (x_k - r_k) + u_k^T R u_k
         + (sigma/2)||u_k - u_k^prev||^2 + (rho/2)||C u_k - z_k + y_k/rho||^2
    s.t. x_{k+1} = Ad x_k + B_k u_k,   x_0 = x_t,

solved exactly by a backward Riccati recursion over the 13-state chain —
O(h) work in 13/12-wide blocks instead of O(h^2) condensing plus O((12h)^2)
iterations.  Per solve:

- **factor** (once): P_k / K_k / M_k^{-1} backward pass.  All ADMM-iteration
  dependence is in the LINEAR terms, so gains are iteration-invariant.
- **iterate** (x N): backward affine sweep (p_k), forward rollout
  (u_k = -K_k x_k - d_k), then the standard over-relaxed z/y projection
  on the per-(step,leg) friction pyramid.

Structure exploited (this is why the FLOP count collapses):

- ``C^T C`` of the 5-row pyramid block is DIAGONAL: diag(2, 2, 4 mu^2 + 1)
  per leg, so the input-cost matrix ``Hu_k`` is a (12,) diagonal.
- Swing legs are removed exactly: their B columns are zeroed per step and
  the variable is cost-pinned (the sparse-form analog of
  ``cones.mask_cost``; at the reference optimum swing forces are exactly 0,
  ref ``linear_mpc/mpc.py:248-258``, so deleting the variable preserves the
  optimum and the pinned component decays to 0 geometrically).
- Ad, Bd are shared across the horizon (the reference linearizes once per
  solve, ref ``linear_mpc/mpc.py:266-268``); only the gait gating varies
  per step.

No Ruiz equilibration: the pyramid rows have ~unit inf-norm already and the
LQR solve is exact in the x block, so per-row scaling buys nothing here
(measured: the iteration count knee matches the condensed path's scaled
knee at the rho below).

This file is the pure-JAX (batch-major) implementation: the oracle for the
batch-minor Pallas kernels in :mod:`riccati_pallas` and the CPU-mesh path.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import NUM_INPUT, NUM_STATE, MpcParams
from pympc_quadruped_tpu.ops.qp.admm_fast import _gauss_jordan_inv, _pyramid_rows

_PREC = jax.lax.Precision.HIGHEST

ROWS_PER_LEG = 5
ROWS_PER_STEP = 20


class RiccatiConfig(NamedTuple):
    """Tuning of the sparse path (natural problem units — no Ruiz here).

    Defaults are the COLD tuning from the r5 grid on the 8-phase trot
    oracle families at h=10 AND h=16 (tools/tune_riccati.py artifact in
    docs/performance.md); ``inloop()`` is the warm receding-horizon preset.
    """
    iterations: int = 56
    rho: float = 2.0e-4
    sigma: float = 1.0e-6
    alpha: float = 1.8
    pin: float = 1.0           # quadratic pin on removed swing variables
    tile: int = 128            # scenarios per Pallas grid step
    normalize: bool = False    # per-scenario rho ∝ (m_ref/m)^2 (see below)

    @classmethod
    def inloop(cls) -> "RiccatiConfig":
        """Warm-started receding-horizon preset (see AdmmFastConfig.inloop
        for the methodology; grid re-run for the sparse path).

        The sparse path has no Ruiz equilibration, so a FIXED rho must
        hold across the ROBOT range, and it does not: A1's scale (mass
        4.7 vs 9.0, x10-inertia quirk) breaks the Aliengo-trot optimum
        4e-4 in the full-order torque loop (r5 grid: A1 trot passes 1/4
        at 4e-4, 2/4 at 56 it, 4/4 at rho 1e-3; jumping16+ramp 7/8 at
        4e-4, 8/8 at >= 7e-4; all Aliengo gates indifferent across
        4e-4..2e-3).  The fix is ``normalize=True``: per-scenario
        ``rho_eff = rho * (m_ref/m)^2`` read off the raw input map
        (:func:`rho_scale_from_Bd`), which keeps Aliengo at its 4e-4
        optimum bit-for-bit-scale and lands A1 at 1.47e-3 — inside its
        measured passing band — with no per-robot tuning.  (The interim
        r5 compromise, a fixed rho 1e-3, is strictly dominated: it sat
        2.5x off Aliengo's optimum to stay inside A1's band.)
        """
        return cls(iterations=40, rho=4.0e-4, normalize=True)


#: Trunk mass [kg] of the robot every rho grid in this module was run on
#: (Aliengo, ref ``config/robot_configs.py:22``).  ``rho_scale_from_Bd``
#: returns exactly 1.0 for a robot of this mass, so normalization is a
#: no-op-by-scale for the tuning robot.
MASS_NORM_REF = 9.042


def rho_scale_from_Bd(Bd: jnp.ndarray, mpc: MpcParams) -> jnp.ndarray:
    """Per-scenario ADMM step-size normalization ``(m_ref / m)^2``, (B,).

    The force-block of the reduced Hessian scales as ``||Su||^2 ~ (dt/m)^2``
    (the linear-velocity rows of Bd are EXACTLY ``dt/m * I3`` per stance
    leg: v-dot couples to no other state under the SRB nilpotent ZOH, see
    ``ops/srb.py:discretize``), so the well-tuned rho for a robot of mass
    ``m`` is the reference tuning scaled by ``(m_ref/m)^2``.  Reading the
    scale off the RAW traced ``Bd`` (rows 9:12, sum of 12 squared entries
    = ``12 (dt/m)^2``, geometry-independent) instead of a robot-params
    lookup means per-scenario mass domain randomization
    (``parallel/sweep.py:randomized_robots``) is normalized for free.

    Measured (r5, full-order torque-loop trot): A1 at the Aliengo optimum
    rho 4e-4 diverges (vel_err 1.58); with this scale (-> 1.47e-3, inside
    A1's measured 1e-3..2e-3 band) it tracks — while Aliengo keeps its
    own optimum instead of the old fixed-1e-3 compromise.
    """
    s = jnp.sum(jnp.square(Bd[:, 9:12, :]), axis=(1, 2)) / 12.0  # (dt/m)^2
    ref = (jnp.float32(mpc.dt_predict) / MASS_NORM_REF) ** 2
    return s / ref


class RiccatiFactors(NamedTuple):
    """Iteration-invariant LQR factorization (batch-major)."""
    K: jnp.ndarray       # (B,h,12,13) feedback gains
    Minv: jnp.ndarray    # (B,h,12,12) inverses of Hu + B^T P B
    Bk: jnp.ndarray      # (B,h,13,12) per-step (swing-masked) input maps


def cone_block() -> jnp.ndarray:
    """The (5,3) per-leg friction-pyramid rows in l <= C f <= u form
    (ref ``linear_mpc/mpc.py:239-245``)."""
    return _pyramid_rows(0.7)  # caller passes mu explicitly below


def step_gating(gait_table: jnp.ndarray, horizon: int):
    """Per-step masks from the stance table.

    Returns:
      m_u:  (B,h,12) 1.0 on stance-leg force components (B columns / pins).
      gate: (B,h,20) 1.0 on stance rows of the pyramid.
    """
    stance = gait_table.reshape(-1, horizon, 4)
    m_u = jnp.repeat(stance, 3, axis=-1)
    gate = jnp.repeat(stance, ROWS_PER_LEG, axis=-1)
    return m_u, gate


def step_bounds(gait_table: jnp.ndarray, fz_max, horizon: int):
    """(B,h,20) lower/upper row bounds; swing rows inactive (0 <= z <= 1
    with z pinned at 0 by the gate), mirroring admm_fast.row_bounds."""
    stance = gait_table.reshape(-1, horizon, 4)
    B = stance.shape[0]
    inf = jnp.float32(jnp.inf)
    fz = jnp.asarray(fz_max, jnp.float32)
    if fz.ndim == 1:
        fz = fz[:, None, None]
    u_leg = jnp.stack(
        [
            jnp.broadcast_to(inf, stance.shape),
            jnp.broadcast_to(inf, stance.shape),
            jnp.broadcast_to(inf, stance.shape),
            jnp.broadcast_to(inf, stance.shape),
            jnp.broadcast_to(fz, stance.shape),
        ],
        axis=-1,
    ).reshape(B, horizon, ROWS_PER_STEP)
    gate = jnp.repeat(stance, ROWS_PER_LEG, axis=-1)
    u = jnp.where(gate > 0.0, u_leg, 1.0)
    return jnp.zeros_like(u), u


def input_cost_diag(m_u: jnp.ndarray, mpc: MpcParams, cfg: RiccatiConfig,
                    rho_b: jnp.ndarray | None = None):
    """(B,h,12) diagonal of Hu_k = 2R + sigma + rho C^T C (stance) or the
    pin (swing).  C^T C per leg = diag(2, 2, 4 mu^2 + 1).

    ``rho_b``: optional (B,) per-scenario step size (``cfg.normalize``
    path); default is the scalar ``cfg.rho``."""
    mu = mpc.friction_coef
    ctc_leg = jnp.stack(
        [jnp.float32(2.0), jnp.float32(2.0), 4.0 * mu * mu + 1.0]
    )
    base = 2.0 * mpc.r_diag + cfg.sigma
    ctc = jnp.tile(ctc_leg, 4)
    rho = cfg.rho if rho_b is None else rho_b[:, None, None]
    return jnp.where(
        m_u > 0.0, base + rho * ctc, base + cfg.pin
    )


def lqr_factor(
    Ad: jnp.ndarray,       # (B,13,13)
    Bd: jnp.ndarray,       # (B,13,12)
    hu: jnp.ndarray,       # (B,h,12) diagonal input cost
    m_u: jnp.ndarray,      # (B,h,12) stance variable mask
    mpc: MpcParams,
) -> RiccatiFactors:
    """Backward Riccati matrix pass: P_h = 2Q; for k = h-1 .. 0

        M_k = Hu_k + B_k^T P_{k+1} B_k          (12x12 SPD)
        G_k = B_k^T P_{k+1} Ad                  (12x13)
        K_k = M_k^{-1} G_k
        P_k = 2Q + Ad^T P_{k+1} Ad - G_k^T K_k  (symmetrized)

    with B_k = Bd masked to stance columns.  The 2Q at k = 0 is harmless
    (P_0 is never consumed; x_0 is data).
    """
    h = mpc.horizon
    q2 = 2.0 * mpc.q_diag                                     # (13,)

    def mm(a, b):
        return jnp.matmul(a, b, precision=_PREC)

    def step(P, inputs):
        hu_k, m_k = inputs                                    # (B,12),(B,12)
        Bk = Bd * m_k[:, None, :]                             # (B,13,12)
        PB = mm(P, Bk)                                        # (B,13,12)
        # NB: must go through mm() — a bare `@` is DEFAULT precision, which
        # on TPU runs bf16 passes and sinks the whole factorization below
        # the 1e-5 oracle gap gate (caught by the TPU-lane
        # test_lqr_factor_is_exact_unconstrained / test_cold_quality_*).
        M = mm(jnp.swapaxes(Bk, -1, -2), PB)
        M = 0.5 * (M + jnp.swapaxes(M, -1, -2))
        M = M + jax.vmap(jnp.diag)(hu_k)
        Minv = _gauss_jordan_inv(M)
        G = mm(jnp.swapaxes(PB, -1, -2), Ad)                  # (B,12,13)
        K = mm(Minv, G)
        P_new = mm(jnp.swapaxes(Ad, -1, -2), mm(P, Ad)) - mm(
            jnp.swapaxes(G, -1, -2), K
        )
        P_new = 0.5 * (P_new + jnp.swapaxes(P_new, -1, -2))
        P_new = P_new + jax.vmap(jnp.diag)(jnp.broadcast_to(q2, hu_k.shape[:1] + (NUM_STATE,)))
        return P_new, (K, Minv, Bk)

    B = Ad.shape[0]
    P_h = jnp.broadcast_to(jnp.diag(q2), (B, NUM_STATE, NUM_STATE))
    # Scan k = h-1 .. 0 (reverse over the step axis).
    hu_rev = jnp.flip(hu, axis=1).swapaxes(0, 1)              # (h,B,12)
    mu_rev = jnp.flip(m_u, axis=1).swapaxes(0, 1)
    _, (K, Minv, Bk) = jax.lax.scan(step, P_h, (hu_rev, mu_rev))
    # Outputs come back k = h-1 .. 0; flip to k-ascending, batch-major.
    flip = lambda a: jnp.flip(a, axis=0).swapaxes(0, 1)
    return RiccatiFactors(K=flip(K), Minv=flip(Minv), Bk=flip(Bk))


def _cone_matvec(pat, u):                                     # (B,h,12)->(B,h,20)
    B, h, _ = u.shape
    ub = u.reshape(B, h, 4, 3)
    return jnp.einsum("rc,bhlc->bhlr", pat, ub, precision=_PREC).reshape(
        B, h, ROWS_PER_STEP
    )


def _cone_rmatvec(pat, w):                                    # (B,h,20)->(B,h,12)
    B, h, _ = w.shape
    wb = w.reshape(B, h, 4, ROWS_PER_LEG)
    return jnp.einsum("rc,bhlr->bhlc", pat, wb, precision=_PREC).reshape(
        B, h, NUM_INPUT
    )


def iterate(
    factors: RiccatiFactors,
    Ad: jnp.ndarray,        # (B,13,13)
    x_t: jnp.ndarray,       # (B,13)
    X_ref: jnp.ndarray,     # (B,h,13)
    gate: jnp.ndarray,      # (B,h,20)
    l: jnp.ndarray,         # (B,h,20)
    u_bnd: jnp.ndarray,     # (B,h,20)
    mpc: MpcParams,
    cfg: RiccatiConfig,
    init=None,
    rho_b: jnp.ndarray | None = None,
):
    """Over-relaxed ADMM sweeps.  Returns (U (B,h,12), y (B,h,20)).

    ``rho_b``: optional (B,) per-scenario step size; broadcast against the
    (B,h,20) splitting arrays.  Must match the rho folded into ``hu`` by
    :func:`input_cost_diag`."""
    B, h = X_ref.shape[0], X_ref.shape[1]
    pat = _pyramid_rows(mpc.friction_coef)
    sigma, alpha = cfg.sigma, cfg.alpha
    rho = cfg.rho if rho_b is None else rho_b[:, None, None]
    q_x = -2.0 * mpc.q_diag * X_ref                           # (B,h,13)

    K_t = jnp.swapaxes(factors.K, -1, -2)                     # (B,h,13,12)
    B_t = jnp.swapaxes(factors.Bk, -1, -2)                    # (B,h,12,13)
    A_t = jnp.swapaxes(Ad, -1, -2)

    def mv(Mstack, v):                                        # (B,a,b),(B,b)
        return jnp.einsum("bij,bj->bi", Mstack, v, precision=_PREC)

    def one_iteration(carry, _):
        u_prev, z, y = carry                                  # (B,h,12),(B,h,20)x2
        w = gate * (y - rho * z)
        q_u = _cone_rmatvec(pat, w) - sigma * u_prev          # (B,h,12)

        # Backward affine sweep (k = h-1 .. 0), step-major sequences.
        q_u_s = jnp.swapaxes(q_u, 0, 1)                       # (h,B,12)
        q_x_s = jnp.swapaxes(q_x, 0, 1)                       # (h,B,13)
        Bt_s = jnp.swapaxes(B_t, 0, 1)                        # (h,B,12,13)
        Kt_s = jnp.swapaxes(K_t, 0, 1)
        Mi_s = jnp.swapaxes(factors.Minv, 0, 1)

        def back(p, inputs):
            q_u_k, q_x_km1, Bt_k, Kt_k, Minv_k = inputs
            m_k = q_u_k + mv(Bt_k, p)
            d_k = mv(Minv_k, m_k)
            p_out = q_x_km1 + mv(A_t, p) - mv(Kt_k, m_k)
            return p_out, d_k

        p_h = q_x_s[h - 1]
        # At step k the state-cost row folded into p is q_x[k-1] <-> x_k;
        # for k = 0 any row works (p_0 is discarded) — reuse row 0.
        q_x_shift = jnp.concatenate([q_x_s[:1], q_x_s[:-1]], axis=0)
        inputs = (q_u_s, q_x_shift, Bt_s, Kt_s, Mi_s)
        rev = jax.tree.map(lambda a: jnp.flip(a, 0), inputs)
        _, d_rev = jax.lax.scan(back, p_h, rev)
        d = jnp.flip(d_rev, 0)                                # (h,B,12)

        # Forward rollout.
        K_s = jnp.swapaxes(factors.K, 0, 1)                   # (h,B,12,13)
        Bk_s = jnp.swapaxes(factors.Bk, 0, 1)                 # (h,B,13,12)

        def fwd(x, inputs):
            K_k, Bk_k, d_k = inputs
            u_k = -mv(K_k, x) - d_k
            x_next = mv(Ad, x) + mv(Bk_k, u_k)
            return x_next, u_k

        _, u_tilde = jax.lax.scan(fwd, x_t, (K_s, Bk_s, d))
        u_tilde = jnp.swapaxes(u_tilde, 0, 1)                 # (B,h,12)

        zt = gate * _cone_matvec(pat, u_tilde)
        u_new = alpha * u_tilde + (1.0 - alpha) * u_prev
        zbar = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(zbar + y / rho, l, u_bnd)
        y_new = y + rho * (zbar - z_new)
        return (u_new, z_new, y_new), None

    if init is None:
        init = (
            jnp.zeros((B, h, NUM_INPUT), x_t.dtype),
            jnp.zeros((B, h, ROWS_PER_STEP), x_t.dtype),
            jnp.zeros((B, h, ROWS_PER_STEP), x_t.dtype),
        )
    (u_fin, z, y), _ = jax.lax.scan(one_iteration, init, None,
                                    length=cfg.iterations)
    return u_fin, y


def solve_batch(
    Ad: jnp.ndarray,         # (B,13,13)
    Bd: jnp.ndarray,         # (B,13,12)
    x_t: jnp.ndarray,        # (B,13)
    X_ref: jnp.ndarray,      # (B,h,13) or (B,13h)
    gait_table: jnp.ndarray, # (B,4h)
    fz_max,
    mpc: MpcParams,
    cfg: RiccatiConfig = RiccatiConfig(),
    backend: str = "auto",
    warm=None,
    return_duals: bool = False,
):
    """Sparse-path batched MPC solve.  Returns (B,12h) U (+ (B,20h) duals).

    ``warm`` is an unscaled ``(U0 (B,12h), lam0 (B,20h))`` like
    admm_fast.solve_batch's; the sparse path has no scalings, so it maps
    straight onto (u, z, y)."""
    B = x_t.shape[0]
    h = mpc.horizon
    X_ref = X_ref.reshape(B, h, NUM_STATE)
    m_u, gate = step_gating(gait_table, h)
    l, u_bnd = step_bounds(gait_table, fz_max, h)
    rho_b = None
    if cfg.normalize:
        rho_b = cfg.rho * rho_scale_from_Bd(Bd, mpc)          # (B,)
    hu = input_cost_diag(m_u, mpc, cfg, rho_b=rho_b)

    init = None
    if warm is not None:
        U0, lam0 = warm
        u0 = jnp.asarray(U0, x_t.dtype).reshape(B, h, NUM_INPUT)
        y0 = gate * jnp.asarray(lam0, x_t.dtype).reshape(B, h, ROWS_PER_STEP)
        pat = _pyramid_rows(mpc.friction_coef)
        z0 = jnp.clip(gate * _cone_matvec(pat, u0), l, u_bnd)
        init = (u0, z0, y0)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas":
        from pympc_quadruped_tpu.ops.qp import riccati_pallas

        U, y = riccati_pallas.factor_iterate(
            Ad, Bd, x_t, X_ref, hu, m_u, gate, l, u_bnd, mpc, cfg, init,
            rho_b=rho_b,
        )
    else:
        factors = lqr_factor(Ad, Bd, hu, m_u, mpc)
        U, y = iterate(
            factors, Ad, x_t, X_ref, gate, l, u_bnd, mpc, cfg, init,
            rho_b=rho_b,
        )
    U = (U * m_u).reshape(B, h * NUM_INPUT)
    if return_duals:
        return U, y.reshape(B, h * ROWS_PER_STEP)
    return U
