"""Execute the ACTUAL reference controller's numpy stages against the engine.

The golden lockstep (tests/test_golden_lockstep.py) compares the engine to
``oracle/npref.py`` — the builder's own f64 rewrite.  A shared misreading of
the reference would be invisible there.  This suite closes that hole: it
imports ``/root/reference/linear_mpc/mpc.py`` and ``gait.py`` THEMSELVES
(with the native deps stubbed — drake/qpsolvers are never reached because
``_solve_mpc`` is monkeypatched to capture the pure-numpy stages, and
``robot_data``'s Pinocchio hub is replaced by a duck-typed namespace fed the
same kinematic quantities as the engine), drives both sides with an
identical observation sequence, and lockstep-compares every stage:

    gait table          ref gait.py:76-100          exact
    X_ref               ref mpc.py:110-170          1e-4
    Ac/Bc, Ad/Bd        ref mpc.py:173-208          f32-tight
    condensed H, g      ref mpc.py:211-235          f32-relative
    cone C / bounds     ref mpc.py:237-260          exact pattern
    GRFs                engine parity IPM on the REFERENCE's own (H, g)
                        vs the certified f64 optimum of that data: <= 1e-3
                        (the BASELINE bar, on identical data)

Runs at the reference's shipped configuration (horizon 16, TROTTING10,
20 ticks between solves — ref ``config/linear_mpc_configs.py``).
Skipped when /root/reference is not mounted.
"""
import importlib
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.control import refmpc
from pympc_quadruped_tpu.ops import condense, gaitsched, kin, srb
from pympc_quadruped_tpu.ops.qp import cones, ipm
from pympc_quadruped_tpu.oracle import npref

from test_golden_lockstep import synthetic_obs

REF = "/root/reference"
HORIZON = 16          # the reference's shipped horizon (linear_mpc_configs.py)
NUM_TICKS = 100       # 5 solves
V_DES = [1.2, 0.0, 0.0]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "linear_mpc")),
    reason="reference checkout not mounted",
)


def _never(*a, **k):
    raise RuntimeError("stubbed native dependency was reached")


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference's mpc/gait modules with native deps stubbed."""
    stubs = {}
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    numba.vectorize = numba.jit
    numba.float32 = np.float32
    stubs["numba"] = numba

    pydrake_all = types.ModuleType("pydrake.all")
    pydrake_all.MathematicalProgram = _never
    pydrake_all.Solve = _never
    pydrake_all.PiecewisePolynomial = _never
    pydrake = types.ModuleType("pydrake")
    pydrake.all = pydrake_all
    stubs["pydrake"] = pydrake
    stubs["pydrake.all"] = pydrake_all

    qpsolvers = types.ModuleType("qpsolvers")
    qpsolvers.solve_qp = _never
    stubs["qpsolvers"] = qpsolvers

    robot_data = types.ModuleType("robot_data")
    robot_data.RobotData = type("RobotData", (), {})  # type-hint only
    stubs["robot_data"] = robot_data

    saved_mods = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    paths = [os.path.join(REF, d) for d in ("linear_mpc", "config", "utils")]
    for p in paths:
        sys.path.insert(0, p)
    # These generic top-level names must come from the reference dirs.
    for name in ("mpc", "gait", "linear_mpc_configs", "robot_configs", "kinematics"):
        assert name not in sys.modules or saved_mods.get(name) is None
    try:
        ref_mpc = importlib.import_module("mpc")
        ref_gait = importlib.import_module("gait")
        ref_cfg = importlib.import_module("linear_mpc_configs")
        ref_rcfg = importlib.import_module("robot_configs")
        yield ref_mpc, ref_gait, ref_cfg.LinearMpcConfig, ref_rcfg.AliengoConfig
    finally:
        for name in (
            "mpc", "gait", "linear_mpc_configs", "robot_configs",
            "kinematics", "dynamics",
        ):
            sys.modules.pop(name, None)
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for p in paths:
            sys.path.remove(p)


@pytest.fixture(scope="module")
def lockstep(ref_modules):
    """Run reference and engine stages over the same tick/observation stream."""
    ref_mpc, ref_gait, LinearMpcConfig, AliengoConfig = ref_modules
    assert LinearMpcConfig.horizon == HORIZON

    # ---------------- reference side -------------------------------------
    ctl = ref_mpc.ModelPredictiveController(LinearMpcConfig, AliengoConfig)
    ref_stages = {}

    def _solve_capture(self, ref_traj, gait_table, solver="drake", debug=False):
        Ac, Bc = self._generate_state_space_model()
        Ad, Bd = self._discretize_continuous_model(Ac, Bc)
        H, g = self._generate_QP_cost(Ad, Bd, self.current_state, ref_traj)
        C, lb, ub = self._generate_QP_constraints(gait_table)
        U, kkt = npref.solve_qp_kkt(
            np.asarray(H, np.float64),
            np.asarray(g, np.float64),
            float(self.mu),
            float(self.fz_max),
            np.asarray(gait_table, np.float64),
        )
        assert max(kkt) < 1e-7
        ref_stages[self._tick] = dict(
            X_ref=np.asarray(ref_traj, np.float64),
            Ac=np.asarray(Ac, np.float64), Bc=np.asarray(Bc, np.float64),
            Ad=np.asarray(Ad, np.float64), Bd=np.asarray(Bd, np.float64),
            H=np.asarray(H, np.float64), g=np.asarray(g, np.float64),
            C=np.asarray(C, np.float64), lb=np.asarray(lb, np.float64),
            ub=np.asarray(ub, np.float64),
            table=np.asarray(gait_table, np.float64), U=U,
        )
        return U

    ctl._solve_mpc = types.MethodType(_solve_capture, ctl)
    gait_ref = ref_gait.Gait.TROTTING10

    # ---------------- engine side -----------------------------------------
    mpc = MpcParams(horizon=HORIZON)
    robot = aliengo()
    gait = Gaits.trotting10()
    cmd = Command(
        vel_base_des=jnp.asarray(V_DES, jnp.float32),
        yaw_turn_rate=jnp.float32(0.0),
    )
    carry = refmpc.MpcCarry.init(HORIZON)
    eng_stages = {}

    for tick in range(NUM_TICKS):
        o = synthetic_obs(tick)
        obs = kin.RobotObs(
            pos_base=jnp.asarray(o["pos"], jnp.float32),
            lin_vel_base=jnp.asarray(o["vel"], jnp.float32),
            quat_base=jnp.asarray(o["quat"], jnp.float32),
            ang_vel_base=jnp.asarray(o["omega"], jnp.float32),
            q=jnp.asarray(o["q"], jnp.float32),
            qdot=jnp.asarray(o["qdot"], jnp.float32),
        )
        ks = kin.compute_kin_state(robot, obs)

        # Engine stages (mirrors controller._pre_solve / _solve_branch).
        x_t = jnp.concatenate(
            [
                ks.rpy_base, ks.pos_base, ks.ang_vel_base, ks.lin_vel_base,
                jnp.reshape(-mpc.gravity, (1,)),
            ]
        ).astype(jnp.float32)
        carry, vel_des_world = refmpc.integrate_desired(carry, ks, cmd, mpc)
        if tick % 20 == 0:
            table = gaitsched.gait_table(gait, mpc, jnp.int32(tick))
            carry, X = refmpc.reference_trajectory(
                carry, x_t, vel_des_world, cmd, mpc, robot
            )
            Ac, Bc = srb.state_space(robot, x_t[2], ks.pos_base_feet)
            Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
            H, g = condense.condense(Ad, Bd, x_t, X.reshape(-1), mpc)
            eng_stages[tick] = dict(
                X_ref=np.asarray(X.reshape(-1), np.float64),
                Ac=np.asarray(Ac, np.float64), Bc=np.asarray(Bc, np.float64),
                Ad=np.asarray(Ad, np.float64), Bd=np.asarray(Bd, np.float64),
                H=np.asarray(H, np.float64), g=np.asarray(g, np.float64),
                table=np.asarray(table, np.float64),
            )

        # Reference side: same kinematic quantities the engine computed.
        rd = types.SimpleNamespace(
            pos_base=np.asarray(ks.pos_base, np.float64),
            lin_vel_base=np.asarray(ks.lin_vel_base, np.float64),
            quat_base=np.asarray(o["quat"], np.float64),
            ang_vel_base=np.asarray(ks.ang_vel_base, np.float64),
            pos_base_feet=np.asarray(ks.pos_base_feet, np.float64),
            R_base=np.asarray(ks.R_base, np.float64),
        )
        ctl.update_robot_state(rd)
        gait_ref.set_iteration(ctl.iterations_between_mpc, tick)
        ctl._tick = tick
        ctl.update_mpc_if_needed(
            tick, np.asarray(V_DES, np.float64), 0.0, gait_ref.get_gait_table()
        )

    assert set(ref_stages) == set(eng_stages)
    return ref_stages, eng_stages, mpc, robot


def _solve_ticks(stages):
    return sorted(stages[0])


def test_gait_tables_match_reference_exactly(lockstep):
    ref, eng, *_ = lockstep
    for t in _solve_ticks(lockstep):
        np.testing.assert_array_equal(eng[t]["table"], ref[t]["table"], err_msg=f"tick {t}")


def test_reference_trajectory_matches(lockstep):
    ref, eng, *_ = lockstep
    for t in _solve_ticks(lockstep):
        np.testing.assert_allclose(
            eng[t]["X_ref"], ref[t]["X_ref"], atol=1e-4, err_msg=f"tick {t}"
        )


def test_state_space_matches(lockstep):
    ref, eng, *_ = lockstep
    for t in _solve_ticks(lockstep):
        np.testing.assert_allclose(eng[t]["Ac"], ref[t]["Ac"], atol=1e-5)
        np.testing.assert_allclose(eng[t]["Bc"], ref[t]["Bc"], rtol=2e-5, atol=1e-7)


def test_discretization_matches_reference_expm(lockstep):
    """Engine's exact nilpotent-series ZOH vs the reference's scipy expm."""
    ref, eng, *_ = lockstep
    for t in _solve_ticks(lockstep):
        np.testing.assert_allclose(eng[t]["Ad"], ref[t]["Ad"], atol=2e-6)
        np.testing.assert_allclose(eng[t]["Bd"], ref[t]["Bd"], atol=2e-7)


def test_condensed_qp_matches(lockstep):
    """H/g parity at the f32 rounding scale of two independent condensings."""
    ref, eng, *_ = lockstep
    for t in _solve_ticks(lockstep):
        h_scale = np.max(np.abs(ref[t]["H"]))
        g_scale = np.max(np.abs(ref[t]["g"])) + 1.0
        assert np.max(np.abs(eng[t]["H"] - ref[t]["H"])) / h_scale < 5e-5
        assert np.max(np.abs(eng[t]["g"] - ref[t]["g"])) / g_scale < 5e-4


def test_cone_constraints_match(lockstep):
    """The reference's kron-built C and gait-gated bounds vs the engine's
    shared pattern + row bounds (ref mpc.py:237-260)."""
    from pympc_quadruped_tpu.ops.qp import admm_fast

    ref, eng, mpc, robot = lockstep
    P0 = np.asarray(admm_fast.cone_pattern(mpc.friction_coef, HORIZON), np.float64)
    for t in _solve_ticks(lockstep):
        np.testing.assert_allclose(P0, ref[t]["C"], atol=1e-7)
        np.testing.assert_array_equal(ref[t]["lb"], 0.0)
        srow, l, u = admm_fast.row_bounds(
            jnp.asarray(ref[t]["table"], jnp.float32)[None], robot.fz_max, HORIZON
        )
        u = np.asarray(u[0], np.float64)
        stance_rows = np.asarray(srow[0]) > 0
        np.testing.assert_allclose(
            u[stance_rows],
            ref[t]["ub"][stance_rows],
            rtol=1e-6,
        )
        # Swing rows: reference encodes force=0 via ub=0; the engine pins the
        # variables in the cost instead — assert the reference really zeroes.
        fz_rows = np.arange(4, 20 * HORIZON, 5)
        swing_fz = fz_rows[~stance_rows[fz_rows]]
        np.testing.assert_array_equal(ref[t]["ub"][swing_fz], 0.0)


def test_engine_solves_reference_qp_to_1e3(lockstep):
    """BASELINE bar on identical data: the parity IPM run on the REFERENCE'S
    OWN condensed (H, g) lands within 1e-3 of the certified f64 optimum of
    that data.

    Identical-data protocol (same as tests/test_qp.py): the reference
    accumulates H in float64 (its f32 Su is promoted by the f64 Q kron,
    ref mpc.py:47-51,232-233), so the data is rounded to f32 ONCE and both
    sides solve the rounded problem — rounding the data itself moves the
    optimum ~1e-1 along the R=1e-5 weak directions at horizon 16, which no
    solver can undo.
    """
    ref, eng, mpc, robot = lockstep
    fz_max = float(np.asarray(robot.fz_max))
    for t in _solve_ticks(lockstep):
        table = ref[t]["table"]
        H32 = ref[t]["H"].astype(np.float32).astype(np.float64)
        g32 = ref[t]["g"].astype(np.float32).astype(np.float64)
        U_star, kkt = npref.solve_qp_kkt(H32, g32, 0.7, fz_max, table)
        assert max(kkt) < 1e-7
        mv = np.repeat(table, 3)
        Hm = (H32 * np.outer(mv, mv) + np.diag(1.0 - mv)).astype(np.float32)
        gm = (g32 * mv).astype(np.float32)
        G, h_vec, _ = cones.block_constraints(
            jnp.asarray(table, jnp.float32), robot.fz_max, mpc
        )
        U = np.asarray(
            ipm.solve_batch(
                jnp.asarray(Hm)[None], jnp.asarray(gm)[None],
                G[None], h_vec[None], ipm.PARITY_CONFIG,
            )[0],
            np.float64,
        ) * mv
        U_star = U_star * mv
        err = np.max(np.abs(U - U_star) / (1.0 + np.abs(U_star)))
        assert err < 1e-3, f"tick {t}: GRF error vs certified optimum {err:.2e}"
