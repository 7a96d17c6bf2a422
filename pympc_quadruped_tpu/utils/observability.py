"""Observability: solver health telemetry + host-side async metric logging.

The reference's only observability is ``print()`` around the QP solve and
matplotlib debug plots (ref ``linear_mpc/mpc.py:98-106,293-318`` — SURVEY.md
§5.5).  Production sweeps need structured, batched equivalents:

- :func:`qp_residuals` — on-device KKT health of a batch of returned GRF
  solutions (primal feasibility violation + stationarity), cheap enough to
  ride along with every solve and be collective-reduced across the mesh;
- :class:`MetricsLogger` — accumulates per-step scalar dicts as device
  arrays and drains them to the host asynchronously (one transfer per
  flush, never inside the hot loop).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.ops.qp import admm_fast


def qp_residuals(
    H: jnp.ndarray,           # (B,n,n) masked condensed Hessian
    g: jnp.ndarray,           # (B,n)
    gait_table: jnp.ndarray,  # (B,4h)
    fz_max: jnp.ndarray,
    U: jnp.ndarray,           # (B,n) returned solution
    mpc: MpcParams,
) -> Dict[str, jnp.ndarray]:
    """Per-scenario QP health: max primal violation and a stationarity proxy.

    ``primal`` is the worst violation of the friction-pyramid rows (exact
    feasibility check).  ``grad_norm`` is |H U + g| restricted to stance
    variables — at an exact solution this equals the constraint-force
    reaction, so it is reported as a magnitude scale rather than a zero
    target; its explosion (or NaN) flags a failed solve.
    """
    B = U.shape[0]
    h = mpc.horizon
    P0 = admm_fast.cone_pattern(mpc.friction_coef, h)  # tracer-safe
    srow, l, u = admm_fast.row_bounds(gait_table, fz_max, h)
    z = (U @ P0.T) * srow
    primal = jnp.maximum(jnp.max(l - z, axis=-1), jnp.max(
        jnp.where(jnp.isfinite(u), z - u, -jnp.inf), axis=-1
    ))
    mv = jnp.repeat(gait_table, 3, axis=-1)
    grad = jnp.einsum("bij,bj->bi", H, U) + g
    grad_norm = jnp.linalg.norm(grad * mv, axis=-1)
    return {
        "qp_primal_violation": jnp.maximum(primal, 0.0),
        "qp_grad_norm": grad_norm,
        "qp_finite": jnp.all(jnp.isfinite(U), axis=-1).astype(jnp.float32),
    }


def kkt_residuals_f64(
    H, g, gait_table, fz_max, U, lam, mpc: MpcParams
) -> Dict[str, np.ndarray]:
    """Host-side float64 KKT certificate of a batch of solutions WITH duals.

    Unlike the sibling-comparison parity gate (fused kernel vs jnp
    iteration), this evaluates the returned ``(U, lam)`` pair against the
    RAW problem data ``(H, g, bounds)`` in f64 on the host — independent of
    every solver-internal transformation (Ruiz scaling, K assembly,
    padding), so a common-mode setup bug that fools the sibling comparison
    still fails here (the solver contract of ref ``linear_mpc/mpc.py:277-290``).

    Conventions (OSQP form, ``l <= P0 U <= u``): stationarity
    ``H U + g + P0^T lam = 0``; lam < 0 active at the lower bound, lam > 0
    at the upper.  Returns per-scenario arrays:

    - ``stat_rel``: inf-norm of the stationarity residual over the
      magnitude of the gradient terms;
    - ``primal_N``: worst bound violation of the gated rows [N];
    - ``comp_N``: worst complementarity product, normalized by (1 + fz_max)
      so it reads in Newtons of mismatched force (positive duals on
      unbounded rows count with unit lever);
    - ``finite``: solution and duals all finite.

    ``U`` must be swing-masked (``* mv``) and ``lam`` as returned by
    ``solve_batch(..., return_duals=True)``.
    """
    h = mpc.horizon
    H = np.asarray(H, np.float64)
    g = np.asarray(g, np.float64)
    U = np.asarray(U, np.float64)
    lam = np.asarray(lam, np.float64)
    P0 = np.asarray(admm_fast.cone_pattern(mpc.friction_coef, h), np.float64)
    srow_j, l_j, u_j = admm_fast.row_bounds(
        jnp.asarray(gait_table), fz_max, h
    )
    srow = np.asarray(srow_j, np.float64)
    l = np.asarray(l_j, np.float64)
    u = np.asarray(u_j, np.float64)

    z = U @ P0.T                                             # (B,m)
    HU = np.einsum("bij,bj->bi", H, U)                       # (B,n), the dominant product
    stat = HU + g + lam @ P0                                 # (B,n)
    gscale = 1.0 + np.maximum(
        np.max(np.abs(g), axis=-1), np.max(np.abs(HU), axis=-1)
    )
    stat_rel = np.max(np.abs(stat), axis=-1) / gscale

    gated_lo = np.where(srow > 0, l - z, -np.inf)
    gated_up = np.where((srow > 0) & np.isfinite(u), z - u, -np.inf)
    primal = np.maximum(
        np.max(gated_lo, axis=-1), np.max(gated_up, axis=-1)
    )
    primal = np.maximum(primal, 0.0)

    fz = np.asarray(fz_max, np.float64)
    comp_lo = np.abs(np.minimum(lam, 0.0) * (z - l))
    comp_up = np.maximum(lam, 0.0) * np.where(np.isfinite(u), u - z, 1.0)
    comp = np.max(np.maximum(comp_lo, np.abs(comp_up)), axis=-1) / (
        1.0 + np.max(fz)
    )

    finite = np.isfinite(U).all(axis=-1) & np.isfinite(lam).all(axis=-1)
    return {
        "stat_rel": stat_rel,
        "primal_N": primal,
        "comp_N": comp,
        "finite": finite,
    }


def kkt_gate(res: Dict[str, np.ndarray], fz_max) -> tuple[bool, Dict[str, float]]:
    """Pass/fail gate over :func:`kkt_residuals_f64` output at p99.

    Thresholds (set from the r4 on-chip measurements at the shipping
    56-iteration cold config: split kernel stat_rel p99 ~1.8e-3 at B=256,
    up to ~5.7e-3 on small-batch CPU cases; primal ~0.05 N; comp 0.0.  A
    5% setup-bug injection moves stat_rel to ~3.9e-2 — ~7x the worst clean
    level, so the bands below separate cleanly):

    - stationarity p99 < 1e-2 of gradient scale,
    - primal violation p99 < 1e-3 * fz_max (the BASELINE feasibility bar),
    - complementarity p99 < 1e-2 N.
    """
    fz = float(np.max(np.asarray(fz_max)))
    stat = float(np.percentile(res["stat_rel"], 99))
    primal = float(np.percentile(res["primal_N"], 99))
    comp = float(np.percentile(res["comp_N"], 99))
    ok = (
        bool(np.all(res["finite"]))
        and stat < 1e-2
        and primal < 1e-3 * fz
        and comp < 1e-2
    )
    return ok, {
        "kkt_stat_rel_p99": round(stat, 6),
        "kkt_primal_N_p99": round(primal, 6),
        "kkt_comp_N_p99": round(comp, 6),
        "kkt_finite": bool(np.all(res["finite"])),
    }


class MetricsLogger:
    """Accumulate device scalar dicts; drain to host in one async transfer.

    Usage:
        log = MetricsLogger()
        for step in ...:
            log.append({"mean_vel_err": m1, "survival": m2})   # device scalars
        table = log.drain()    # {key: np.ndarray(steps,)} — single device_get
    """

    def __init__(self):
        self._buf: List[Dict[str, jax.Array]] = []

    def append(self, metrics: Dict[str, jax.Array]) -> None:
        # Keep device arrays (no sync); jax.device_get happens only in drain.
        self._buf.append(dict(metrics))

    def __len__(self) -> int:
        return len(self._buf)

    def drain(self) -> Dict[str, np.ndarray]:
        if not self._buf:
            return {}
        host = jax.device_get(self._buf)   # one batched transfer
        keys = host[0].keys()
        out = {k: np.asarray([row[k] for row in host]) for k in keys}
        self._buf.clear()
        return out
