"""Batched MPC engine facade — the north-star kernel surface.

``solve_scenarios`` is the benchmark unit: a scenario batch of SRB states,
footholds, references and gait tables in, first-step GRFs out, everything
fused into one XLA program (state-space build -> exact ZOH -> gather-based
condensing -> fixed-iteration QP), designed to be wrapped in ``jit`` /
``shard_map`` and scaled over the `('data',)` mesh axis.

This is the TPU answer to the reference's per-robot sequential solve loop
(ref ``scripts/isaacgym_a1.py:119-164``): thousands of scenarios advance in
lockstep with zero host round-trips.
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.control import refmpc
from pympc_quadruped_tpu.ops import srb
from pympc_quadruped_tpu.ops.qp import admm, admm_fast, cones, ipm, riccati


def solve_scenarios(
    robot: RobotParams,
    mpc: MpcParams,
    x_t: jnp.ndarray,          # (B,13)
    yaw: jnp.ndarray,          # (B,)
    pos_base_feet: jnp.ndarray,  # (B,4,3)
    X_ref: jnp.ndarray,        # (B,h,13) or (B,13h)
    gait_table: jnp.ndarray,   # (B,4h)
    solver: Literal["admm", "admm_fast", "admm_ref", "ipm", "riccati"] = "admm",
    ipm_cfg: ipm.IpmConfig = ipm.IpmConfig(),
    admm_cfg: admm.AdmmConfig = admm.AdmmConfig(),
    admm_fast_cfg: admm_fast.AdmmFastConfig = admm_fast.AdmmFastConfig(),
    riccati_cfg: riccati.RiccatiConfig = riccati.RiccatiConfig(),
    return_full_horizon: bool = False,
    return_diagnostics: bool = False,
    warm=None,
    return_duals: bool = False,
) -> jnp.ndarray:
    """Batched condensed-QP MPC solve.

    ``robot`` may be unbatched (shared) or carry a leading batch axis
    (randomization sweep); batched-ness is detected from ``mass``'s ndim.

    Solvers: ``admm`` — the fast path (Ruiz-scaled, Schur-inverse setup,
    Pallas VMEM-resident iteration on TPU); ``admm_ref`` — the plain
    Cholesky/scan formulation kept as an on-device oracle; ``ipm`` — the
    float-float-refined interior-point parity path.

    Returns (B,12) first-step GRFs (or (B,12h) with ``return_full_horizon``).
    With ``return_diagnostics`` also returns the per-scenario QP health dict
    from :func:`pympc_quadruped_tpu.utils.observability.qp_residuals`
    (primal violation, stationarity scale, finite flags) — cheap enough to
    ride along with production sweeps and be collective-reduced.

    ``warm`` (fast path only): an unscaled ``(U_prev, lam_prev)`` warm start
    in problem units — typically the receding-horizon shift of the previous
    solve (see :meth:`admm_fast.AdmmFastConfig.inloop` for the iteration
    cut it enables).  With ``return_duals`` the row duals ride along AFTER
    the diagnostics: ``(U[, diag], lam)``; carry them into the next warm.
    """
    if (warm is not None or return_duals) and solver not in (
        "admm", "admm_fast", "riccati"
    ):
        raise ValueError("warm/return_duals require the fast ADMM or riccati path")
    if return_duals and not return_full_horizon:
        # The warm start consumes the FULL-horizon primal; returning only
        # u_0 alongside the duals would hand the caller an unusable pair.
        raise ValueError("return_duals requires return_full_horizon=True")
    B = x_t.shape[0]
    if jnp.ndim(robot.mass) == 0:
        robot = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + jnp.shape(a)), robot)

    X_ref = X_ref.reshape(B, -1)

    if solver == "riccati":
        # Sparse O(h) path: NO condensing — Ad/Bd feed the Riccati-ADMM
        # solver directly (the h=16 flagship route; see ops/qp/riccati.py).
        Ad, Bd = jax.vmap(
            lambda r, y, p: srb.discretize(
                *srb.state_space(r, y, p), mpc.dt_predict
            )
        )(robot, yaw, pos_base_feet)
        mv = jax.vmap(lambda t: cones.variable_mask(t, mpc))(gait_table)
        res = riccati.solve_batch(
            Ad, Bd, x_t, X_ref, gait_table, robot.fz_max, mpc,
            riccati_cfg, warm=warm, return_duals=return_duals,
        )
        U, lam = res if return_duals else (res, None)
        out = U if return_full_horizon else U[:, :12]
        results = [out]
        if return_diagnostics:
            from pympc_quadruped_tpu.utils import observability

            H, g, _ = jax.vmap(
                lambda r, x, y, p, Xr, t: refmpc.build_qp(r, mpc, x, y, p, Xr, t)
            )(robot, x_t, yaw, pos_base_feet, X_ref, gait_table)
            diag = observability.qp_residuals(
                H, g, gait_table, robot.fz_max, U, mpc
            )
            results.append(diag)
        if return_duals:
            results.append(lam)
        return results[0] if len(results) == 1 else tuple(results)

    H, g, mv = jax.vmap(
        lambda r, x, y, p, Xr, t: refmpc.build_qp(r, mpc, x, y, p, Xr, t)
    )(robot, x_t, yaw, pos_base_feet, X_ref, gait_table)

    if solver == "ipm":
        G, h_vec, _ = jax.vmap(
            lambda t, r: cones.block_constraints(t, r.fz_max, mpc)
        )(gait_table, robot)
        U = ipm.solve_batch(H, g, G, h_vec, ipm_cfg)
    elif solver == "admm_ref":
        A, l, u = jax.vmap(
            lambda t, r: admm.admm_constraints(t, r.fz_max, mpc)
        )(gait_table, robot)
        U = admm.solve_batch(H, g, A, l, u, admm_cfg)
    else:  # "admm" and its alias "admm_fast" — the fast path
        lam = None
        if return_duals:
            U, lam = admm_fast.solve_batch(
                H, g, gait_table, robot.fz_max, mpc, admm_fast_cfg,
                warm=warm, return_duals=True,
            )
        else:
            U = admm_fast.solve_batch(
                H, g, gait_table, robot.fz_max, mpc, admm_fast_cfg, warm=warm
            )

    U = U * mv
    out = U if return_full_horizon else U[:, :12]
    results = [out]
    if return_diagnostics:
        from pympc_quadruped_tpu.utils import observability

        diag = observability.qp_residuals(H, g, gait_table, robot.fz_max, U, mpc)
        results.append(diag)
    if return_duals:
        results.append(lam)
    return results[0] if len(results) == 1 else tuple(results)
