"""Terrain, divergence auto-reset, checkpoint/resume, observability tests
(SURVEY.md §5 auxiliary subsystems)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.env import srb_env, terrain
from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.utils import observability, profiling


# ---------------------------------------------------------------------------
# Terrain
# ---------------------------------------------------------------------------

def test_terrain_flat_height():
    t = terrain.flat(size=4.0, cell=0.1)
    xy = jnp.array([[0.0, 0.0], [1.3, -0.7], [99.0, 99.0]])  # incl. off-grid
    np.testing.assert_allclose(np.asarray(terrain.height_at(t, xy)), 0.0, atol=1e-7)


def test_terrain_slope_height_and_normal():
    t = terrain.slope(grade=0.2, size=8.0, cell=0.1, axis=0)
    xy = jnp.array([[0.0, 0.0], [1.0, 0.5], [-2.0, 1.0]])
    h = np.asarray(terrain.height_at(t, xy))
    # z = grade * (x - origin_x); origin at -4 -> z = 0.2*(x+4)
    np.testing.assert_allclose(h, 0.2 * (np.asarray(xy)[:, 0] + 4.0), atol=1e-5)
    n = np.asarray(terrain.normal_at(t, xy))
    expect = np.array([-0.2, 0.0, 1.0]) / np.linalg.norm([-0.2, 0.0, 1.0])
    np.testing.assert_allclose(n, np.tile(expect, (3, 1)), atol=1e-4)


def test_terrain_stairs_quantized():
    t = terrain.stairs(step_width=0.3, step_height=0.1, size=6.0, cell=0.05)
    # Sample at step centers (grid-aligned so bilinear == exact step height).
    h0 = float(terrain.height_at(t, jnp.array([-3.0 + 0.15, 0.0])))
    h1 = float(terrain.height_at(t, jnp.array([-3.0 + 0.45, 0.0])))
    assert abs(h1 - h0 - 0.1) < 1e-6


def test_terrain_pyramid_platform_flat():
    t = terrain.pyramid(slope_grade=0.3, platform=1.0, size=10.0, cell=0.1)
    center = float(terrain.height_at(t, jnp.array([0.0, 0.0])))
    edge = float(terrain.height_at(t, jnp.array([0.4, 0.0])))
    assert abs(center - edge) < 1e-6  # flat platform
    outside = float(terrain.height_at(t, jnp.array([3.0, 0.0])))
    assert outside < center


def test_terrain_random_rough_bounded_and_deterministic():
    k = jax.random.PRNGKey(0)
    t1 = terrain.random_rough(k, amplitude=0.05, size=4.0, cell=0.1)
    t2 = terrain.random_rough(k, amplitude=0.05, size=4.0, cell=0.1)
    np.testing.assert_array_equal(np.asarray(t1.height), np.asarray(t2.height))
    assert float(jnp.max(jnp.abs(t1.height))) <= 0.05 + 1e-6


def test_physics_step_swing_foot_cannot_penetrate_terrain():
    robot = aliengo()
    mpc = MpcParams(horizon=10)
    t = terrain.slope(grade=0.3, size=8.0, cell=0.1)
    s = srb_env.init_state_on_terrain(robot, t)
    target = s.foot_pos.at[:, 2].add(-0.5)  # command feet half a meter under
    s2 = srb_env.physics_step(
        robot, mpc, s,
        jnp.zeros(12), jnp.ones(4), target, t,
    )
    ground = np.asarray(terrain.height_at(t, s2.foot_pos[:, :2]))
    assert np.all(np.asarray(s2.foot_pos[:, 2]) >= ground - 1e-5)


# ---------------------------------------------------------------------------
# Divergence detection / auto-reset
# ---------------------------------------------------------------------------

def _batched(tree, B):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), tree)


def test_rollout_auto_reset_recovers_poisoned_scenario():
    B = 2
    robot = _batched(aliengo(), B)
    mpc = MpcParams(horizon=10)
    gait = _batched(Gaits.trotting10(), B)
    cmd = _batched(Command.trot_forward(0.5), B)
    init = jax.vmap(srb_env.default_init_state)(robot)
    # Poison scenario 1 with a NaN velocity: auto-reset must snap it back and
    # keep the whole batch finite.
    init = init.replace(vel=init.vel.at[1, 0].set(jnp.nan))
    (env_state, _), metrics = srb_env.rollout(
        robot, mpc, gait, cmd, num_ticks=40, init_state=init, solver="admm"
    )
    assert bool(jnp.any(metrics["diverged"][:, 1])), "divergence not flagged"
    assert not bool(jnp.any(metrics["diverged"][:, 0])), "healthy scenario flagged"
    assert bool(jnp.all(jnp.isfinite(env_state.pos)))


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------

def test_sweep_checkpoint_roundtrip(tmp_path):
    from pympc_quadruped_tpu.parallel.checkpoint import SweepCheckpointer

    state = {
        "env_pos": jnp.arange(12.0).reshape(4, 3),
        "tick": jnp.int32(7),
        "rng": jax.random.PRNGKey(3),
    }
    ckpt = SweepCheckpointer(str(tmp_path / "ck"), keep=2)
    assert ckpt.restore_or(state)[0] == 0          # nothing yet
    ckpt.save(5, state)
    ckpt.wait()
    step, restored = ckpt.restore_or(jax.tree.map(jnp.zeros_like, state))
    assert step == 5
    for k in state:
        np.testing.assert_array_equal(np.asarray(restored[k]), np.asarray(state[k]))
    ckpt.close()


# ---------------------------------------------------------------------------
# Observability
# ---------------------------------------------------------------------------

def test_qp_residuals_flag_good_and_bad_solutions():
    from test_qp import _mpc_instance, _oracle_solution, _masked

    mpc, robot, H64, g64, table = _mpc_instance(0)
    U_star = _oracle_solution(H64, g64, table)
    Hm, gm, mv = _masked(H64, g64, table)
    Hb = jnp.asarray(Hm, jnp.float32)[None]
    gb = jnp.asarray(gm, jnp.float32)[None]
    tb = jnp.asarray(table, jnp.float32)[None]
    Ub = jnp.asarray(U_star * mv, jnp.float32)[None]
    res = observability.qp_residuals(Hb, gb, tb, robot.fz_max, Ub, mpc)
    assert float(res["qp_primal_violation"][0]) < 1e-3
    assert float(res["qp_finite"][0]) == 1.0
    # A grossly infeasible "solution": violation must be flagged.
    res_bad = observability.qp_residuals(
        Hb, gb, tb, robot.fz_max, -1000.0 * jnp.ones_like(Ub), mpc
    )
    assert float(res_bad["qp_primal_violation"][0]) > 100.0


def test_metrics_logger_drains_once():
    log = observability.MetricsLogger()
    for i in range(5):
        log.append({"a": jnp.float32(i), "b": jnp.float32(2 * i)})
    out = log.drain()
    np.testing.assert_allclose(out["a"], np.arange(5.0))
    np.testing.assert_allclose(out["b"], 2 * np.arange(5.0))
    assert len(log) == 0


def test_profiling_timers_run():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((64, 64))
    st = profiling.stage_timings(f, x, iters=3, warmup=1)
    assert st["p50_ms"] > 0.0
    th = profiling.throughput(f, x, iters=3, warmup=1, items_per_call=64)
    assert th["items_per_s"] > 0.0


def test_fullorder_chunked_tick0_matches_monolithic():
    """fullorder.rollout(tick0=...) lets chunked callers (batch viewer,
    resume flows) continue the gait phase: two 60-tick chunks must equal
    one 120-tick rollout bitwise (same scan, same tick stream)."""
    from pympc_quadruped_tpu.env import fullorder
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import aliengo

    B = 2
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(0.8))
    (s_mono, c_mono), _ = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=120
    )
    (s1, c1), _ = fullorder.rollout(robot, mpc, gait, cmd, num_ticks=60)
    (s2, c2), _ = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=60, state0=s1, carry0=c1, tick0=60
    )
    for a, b in zip(jax.tree.leaves(s_mono), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(c_mono), jax.tree.leaves(c2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
