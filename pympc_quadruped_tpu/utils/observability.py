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
