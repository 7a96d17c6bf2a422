"""The full 1 kHz control tick, composed bottom-up and batch-first.

Data flow per tick (mirrors the reference app loop,
ref ``scripts/mujoco_aliengo.py:184-229``):

    obs -> kinematics -> gait phase -> [every Nth tick: MPC solve -> GRFs]
        -> swing-foot targets -> Jacobian-transpose torques

Design notes (TPU-first):

- all controller state lives in an explicit ``ControllerCarry`` pytree;
  ``step`` is pure and jittable, so a scenario sweep is ``vmap(step)``;
- the 50 Hz solve gating is a *scalar* ``lax.cond`` on the shared tick
  counter, applied **outside** the scenario ``vmap`` in :func:`step_batch`.
  Under ``vmap`` a ``cond`` lowers to a ``select`` that executes both
  branches for every element — gating at the batch level instead means the
  expensive condense+solve really only runs on solve ticks;
- scenarios in one batch share the tick phase (they start synchronized),
  which is exactly the reference's semantics for its multi-robot loop
  (ref ``scripts/isaacgym_a1.py:119-164`` — same iteration counter for all
  robots, minus the per-robot host round-trips).
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
from flax import struct

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import GaitParams
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.control import legctrl, refmpc, swing
from pympc_quadruped_tpu.ops import gaitsched, kin, srb
from pympc_quadruped_tpu.ops.qp import admm, admm_fast, cones, ipm, riccati

# Solver used by every closed-loop surface unless overridden: the fast
# condensed ADMM (Ruiz-scaled, matmul-only Schur inverse, Pallas kernels
# on TPU).  The sparse O(h) "riccati" path is 4x faster in-loop at h=10
# (12x at h=16) and is the bench's closed-loop real-time operating point
# (solver="riccati", gated at h10+h16).  Its one structural difference —
# no Ruiz equilibration, so a fixed warm-started rho was robot-scale
# sensitive (r5 measurement, A1 full-order nominal trot vel_err:
# admm_fast 0.052; riccati 1.58 @ rho 4e-4, 0.122 @ 1e-3, 0.043 @ 2e-3)
# — is closed by RiccatiConfig.inloop's per-scenario rho normalization
# (rho_eff = rho * (m_ref/m)^2 read off the traced Bd,
# riccati.rho_scale_from_Bd; A1 gate: test_a1_fullorder_trot_riccati_
# normalized).  The default stays the equilibrated solver for its longer
# cross-robot/gait soak history; "riccati" is a gated, supported opt-in
# for throughput.  "ipm" is the float-float parity path; plain "admm"
# the slow on-device oracle.
DEFAULT_SOLVER = "admm_fast"


@struct.dataclass
class ControllerCarry:
    mpc: refmpc.MpcCarry
    swing: swing.SwingCarry


@struct.dataclass
class ControllerOutput:
    torques: jnp.ndarray        # (12,)
    contact_forces: jnp.ndarray # (12,) world-frame GRFs currently held
    swing_states: jnp.ndarray   # (4,)
    pos_targets: jnp.ndarray    # (4,3) swing-foot targets rel. base, base frame
    vel_targets: jnp.ndarray    # (4,3)
    kin: kin.KinState


def init_carry(horizon: int = 10) -> ControllerCarry:
    return ControllerCarry(
        mpc=refmpc.MpcCarry.init(horizon), swing=swing.SwingCarry.init()
    )


def _pre_solve(robot, mpc, gait, cmd, carry, obs, tick):
    """Everything before the solve decision; shared by both branches."""
    ks = kin.compute_kin_state(robot, obs)
    swing_states = gaitsched.swing_state(gait, mpc, tick)
    table = gaitsched.gait_table(gait, mpc, tick)
    x_t = jnp.concatenate(
        [
            ks.rpy_base,
            ks.pos_base,
            ks.ang_vel_base,
            ks.lin_vel_base,
            jnp.reshape(-mpc.gravity, (1,)),
        ]
    ).astype(jnp.float32)
    mpc_carry, vel_des_world = refmpc.integrate_desired(carry.mpc, ks, cmd, mpc)
    return ks, swing_states, table, x_t, mpc_carry, vel_des_world


def _solve_branch(robot, mpc, cmd, mpc_carry, ks, x_t, vel_des_world, table, solver_cfg):
    """Reference trajectory + batched QP solve; returns (carry', forces).

    All leading axes here are the scenario batch (this function is called on
    already-vmapped operands inside ``step_batch``).

    Failed solves degrade gracefully: a scenario whose solution comes back
    non-finite keeps its previously-held GRFs — the reference's implicit
    behavior, where the last solution stays applied until the next solve
    overwrites it (ref ``linear_mpc/mpc.py:99,108``).
    """
    solver, ipm_cfg, admm_cfg, af_cfg, ric_cfg = solver_cfg
    # Ground-adaptive mode: estimate the local support-plane height from
    # STANCE-foot world z (leg odometry — the measurement a real robot has;
    # no terrain oracle).  Flight steps (no stance leg this segment) fall
    # back to the all-feet mean.  Static branch: off by default, the
    # flat-world reference semantics are untouched bitwise.
    ground_z = None
    if mpc.ground_adaptive_height:
        stance_now = table.reshape(-1, mpc.horizon, 4)[:, 0, :]     # (B,4)
        feet_z = ks.pos_feet[:, :, 2]                               # (B,4)
        n_st = stance_now.sum(axis=-1)
        ground_z = jnp.where(
            n_st > 0,
            (stance_now * feet_z).sum(axis=-1) / jnp.maximum(n_st, 1.0),
            feet_z.mean(axis=-1),
        )
    # The stance table makes the reference flight-aware (ballistic z/vz
    # rows for jumping gaits; BITWISE no-op for any gait without a
    # full-flight step — see refmpc._flight_rows).
    mpc_carry, X = jax.vmap(
        lambda c, x, v, cm, r, t, gz: refmpc.reference_trajectory(
            c, x, v, cm, mpc, r, t, ground_z=gz)
    )(mpc_carry, x_t, vel_des_world, cmd, robot, table,
      ground_z if ground_z is not None
      else jnp.zeros(x_t.shape[0], x_t.dtype))

    yaw = x_t[:, 2]
    if solver == "riccati":
        # Sparse O(h) path: NO condensing in the loop — Ad/Bd feed the
        # Riccati-ADMM solver (ops/qp/riccati.py) with the same shifted
        # warm start as the condensed fast path below.
        Ad, Bd = jax.vmap(
            lambda r, y, p: srb.discretize(
                *srb.state_space(r, y, p), mpc.dt_predict
            )
        )(robot, yaw, ks.pos_base_feet)
        mv = jax.vmap(lambda t: cones.variable_mask(t, mpc))(table)
        U_ws = jnp.concatenate(
            [mpc_carry.qp_primal[:, 12:], mpc_carry.qp_primal[:, -12:]], axis=-1
        )
        lam_ws = jnp.concatenate(
            [mpc_carry.qp_dual[:, 20:], mpc_carry.qp_dual[:, -20:]], axis=-1
        )
        U, lam = riccati.solve_batch(
            Ad, Bd, x_t, X, table, robot.fz_max, mpc, ric_cfg,
            warm=(U_ws, lam_ws), return_duals=True,
        )
        ok_ws = jnp.all(jnp.isfinite(U), axis=-1, keepdims=True) & jnp.all(
            jnp.isfinite(lam), axis=-1, keepdims=True
        )
        mpc_carry = mpc_carry.replace(
            qp_primal=jnp.where(ok_ws, U * mv, 0.0),
            qp_dual=jnp.where(ok_ws, lam, 0.0),
        )
        ok = jnp.all(jnp.isfinite(U), axis=-1, keepdims=True)
        forces = jnp.where(ok, (U * mv)[:, :12], mpc_carry.contact_forces)
        return mpc_carry.replace(contact_forces=forces), forces
    if solver == "ipm_parity":
        # Full-precision path: float-float condensing + compensated IPM.
        # The BASELINE "1e-3 GRF parity vs the CPU reference" configuration
        # (tests/test_golden_lockstep.py) — ~6x the cost of the f32 parity
        # IPM, single-scenario/debug use.
        H, H_lo, g, g_lo, mv = jax.vmap(
            lambda r, x, y, p, Xr, t: refmpc.build_qp_ff(r, mpc, x, y, p, Xr, t)
        )(robot, x_t, yaw, ks.pos_base_feet, X, table)
        G, h_vec, _ = jax.vmap(
            lambda t, r: cones.block_constraints(t, r.fz_max, mpc)
        )(table, robot)
        U = ipm.solve_batch(H, g, G, h_vec, ipm.PARITY_CONFIG, H_lo, g_lo)
        ok = jnp.all(jnp.isfinite(U), axis=-1, keepdims=True)
        forces = jnp.where(ok, (U * mv)[:, :12], mpc_carry.contact_forces)
        return mpc_carry.replace(contact_forces=forces), forces

    H, g, mv = jax.vmap(
        lambda r, x, y, p, Xr, t: refmpc.build_qp(r, mpc, x, y, p, Xr, t)
    )(robot, x_t, yaw, ks.pos_base_feet, X, table)

    if solver == "ipm":
        G, h_vec, _ = jax.vmap(
            lambda t, r: cones.block_constraints(t, r.fz_max, mpc)
        )(table, robot)
        U = ipm.solve_batch(H, g, G, h_vec, ipm_cfg)
    elif solver == "admm":
        A, l, u = jax.vmap(
            lambda t, r: admm.admm_constraints(t, r.fz_max, mpc)
        )(table, robot)
        U = admm.solve_batch(H, g, A, l, u, admm_cfg)
    else:
        # Warm start from the previous solve, shifted by one MPC step
        # (receding horizon: the gait phase advances exactly one segment
        # per solve, so block k of this solve aligns with block k+1 of the
        # last one).  Variables shift by 12 (one step of GRFs), cone rows
        # by 20 (4 legs x 5 pyramid rows); the trailing step repeats.
        U_ws = jnp.concatenate(
            [mpc_carry.qp_primal[:, 12:], mpc_carry.qp_primal[:, -12:]], axis=-1
        )
        lam_ws = jnp.concatenate(
            [mpc_carry.qp_dual[:, 20:], mpc_carry.qp_dual[:, -20:]], axis=-1
        )
        U, lam = admm_fast.solve_batch(
            H, g, table, robot.fz_max, mpc, af_cfg,
            warm=(U_ws, lam_ws), return_duals=True,
        )
        ok_ws = jnp.all(jnp.isfinite(U), axis=-1, keepdims=True) & jnp.all(
            jnp.isfinite(lam), axis=-1, keepdims=True
        )
        # A failed solve resets the warm state to zeros (cold restart next
        # tick) instead of re-feeding non-finite values forever.
        mpc_carry = mpc_carry.replace(
            qp_primal=jnp.where(ok_ws, U * mv, 0.0),
            qp_dual=jnp.where(ok_ws, lam, 0.0),
        )

    ok = jnp.all(jnp.isfinite(U), axis=-1, keepdims=True)
    forces = jnp.where(ok, (U * mv)[:, :12], mpc_carry.contact_forces)
    return mpc_carry.replace(contact_forces=forces), forces


def _post_solve(robot, mpc, gait, cmd, carry_swing, ks, swing_states, forces):
    swing_carry, pos_t, vel_t = swing.update_swing(
        robot, mpc, gait, cmd, ks, carry_swing, swing_states
    )
    torques = legctrl.leg_torques(robot, ks, forces, swing_states, pos_t, vel_t)
    return swing_carry, torques, pos_t, vel_t


def step_batch(
    robot: RobotParams,
    mpc: MpcParams,
    gait: GaitParams,
    cmd: Command,
    carry: ControllerCarry,
    obs: kin.RobotObs,
    tick: jnp.ndarray,
    solver: Literal["admm_fast", "admm", "ipm", "ipm_parity", "riccati"] = DEFAULT_SOLVER,
    ipm_cfg: ipm.IpmConfig = ipm.IpmConfig(),
    admm_cfg: admm.AdmmConfig = admm.AdmmConfig(),
    # In-loop default: the warm-started receding-horizon preset (see
    # AdmmFastConfig.inloop) — every solve after the first starts from the
    # previous tick's shifted primal/dual.
    admm_fast_cfg: admm_fast.AdmmFastConfig = admm_fast.AdmmFastConfig.inloop(),
    riccati_cfg: riccati.RiccatiConfig = riccati.RiccatiConfig.inloop(),
):
    """Batched tick: every pytree argument except ``mpc`` and ``tick`` carries a
    leading scenario axis (``robot``, ``gait`` and ``cmd`` included — they are
    randomization axes).  ``tick`` is the shared scalar tick counter.

    Returns (carry', ControllerOutput) with batch leading axes.
    """
    solver_cfg = (solver, ipm_cfg, admm_cfg, admm_fast_cfg, riccati_cfg)

    ks, swing_states, table, x_t, mpc_carry, vel_des_world = jax.vmap(
        lambda r, gt, cm, c, o: _pre_solve(r, mpc, gt, cm, c, o, tick)
    )(robot, gait, cmd, carry, obs)

    def do_solve(opnds):
        mpc_carry, ks_, x_t_, vel_, table_ = opnds
        return _solve_branch(
            robot, mpc, cmd, mpc_carry, ks_, x_t_, vel_, table_, solver_cfg
        )

    def hold(opnds):
        mpc_carry, *_ = opnds
        return mpc_carry, mpc_carry.contact_forces

    mpc_carry, forces = jax.lax.cond(
        tick % mpc.iterations_between_mpc == 0,
        do_solve,
        hold,
        (mpc_carry, ks, x_t, vel_des_world, table),
    )

    swing_carry, torques, pos_t, vel_t = jax.vmap(
        lambda r, gt, cm, sc, k, ss, f: _post_solve(r, mpc, gt, cm, sc, k, ss, f)
    )(robot, gait, cmd, carry.swing, ks, swing_states, forces)

    out = ControllerOutput(
        torques=torques,
        contact_forces=forces,
        swing_states=swing_states,
        pos_targets=pos_t,
        vel_targets=vel_t,
        kin=ks,
    )
    return ControllerCarry(mpc=mpc_carry, swing=swing_carry), out


def step(
    robot: RobotParams,
    mpc: MpcParams,
    gait: GaitParams,
    cmd: Command,
    carry: ControllerCarry,
    obs: kin.RobotObs,
    tick: jnp.ndarray,
    solver: Literal["admm_fast", "admm", "ipm", "ipm_parity", "riccati"] = DEFAULT_SOLVER,
):
    """Single-scenario tick (batch size 1 under the hood)."""
    batched = jax.tree.map(lambda x: jnp.asarray(x)[None], (robot, gait, cmd, carry, obs))
    robot_b, gait_b, cmd_b, carry_b, obs_b = batched
    carry_b, out_b = step_batch(
        robot_b, mpc, gait_b, cmd_b, carry_b, obs_b, tick, solver=solver
    )
    unb = jax.tree.map(lambda x: x[0], (carry_b, out_b))
    return unb
