"""Scenario sweep runners: batched MPC solves and closed-loop rollouts,
sharded over the `('data',)` mesh axis.

This is the production surface for BASELINE configs 3-5 (gait sweep /
domain randomization / pod-scale command sweep): build a scenario batch,
shard it, and run either

- :func:`solve_sweep_step` — one batched condense+solve (the benchmark unit),
- :func:`rollout_sweep`   — a full closed-loop SRB rollout with collective-
  reduced tracking metrics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu import engine
from pympc_quadruped_tpu.control import controller as ctrl
from pympc_quadruped_tpu.env import srb_env
from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import GaitParams
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import RobotParams
from pympc_quadruped_tpu.parallel import mesh as mesh_lib


def make_scenario_batch(robot: RobotParams, gait: GaitParams, cmd: Command, batch: int):
    """Tile single-scenario params into a batch (randomize by editing leaves)."""
    tile = lambda tree: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + jnp.shape(x)), tree
    )
    return tile(robot), tile(gait), tile(cmd)


#: Per-gait forward-velocity commands for the mixed-gait sweep (m/s).
#: Trot runs the reference's headline 1.2 m/s command
#: (ref ``scripts/mujoco_aliengo.py:179``); the lateral-pair pace and the
#: front/rear-pair bound are dynamically harder and run slower, jumping16
#: (0.6 s flight per cycle) slower still.
GAIT_SWEEP_VX = {
    "trotting10": 1.2,
    "trotting16": 1.0,
    "pacing10": 0.8,
    "pacing16": 0.8,
    "bounding8": 0.6,
    "jumping16": 0.4,
    "standing": 0.0,
}


def mixed_gait_batch(names: list[str], batch: int):
    """A (B,)-batched ``(GaitParams, Command, gait_id)`` cycling through
    ``names`` — the scenario axis of BASELINE config 3 (the reference's gait
    library, ref ``linear_mpc/gait.py:16-22``, exercised closed-loop).

    All gaits in the library share leaf shapes (``num_segments`` scalar +
    two (4,) tables), so mixing them is plain leaf-stacking: the gait is
    data, not structure, and one vmapped rollout advances every gait in
    lockstep.  Returns per-scenario commands from :data:`GAIT_SWEEP_VX`.
    """
    from pympc_quadruped_tpu.models.gaits import Gaits

    gaits = [Gaits.by_name(n) for n in names]
    ids = jnp.arange(batch, dtype=jnp.int32) % len(names)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *gaits)
    gait_b = jax.tree.map(lambda x: x[ids], stacked)
    vx = jnp.asarray([GAIT_SWEEP_VX[n] for n in names], jnp.float32)[ids]
    cmd_b = jax.vmap(Command.trot_forward)(vx)
    return gait_b, cmd_b, ids


@partial(jax.jit, static_argnames=("num_ticks", "n_g", "solver"))
def _gait_sweep_run(robot_b, mpc, gait_b, cmd_b, ids, num_ticks, n_g, solver):
    """Jitted core of :func:`gait_sweep` — module-level so repeated sweeps
    (and benchmark warm-up vs timed runs) hit the jit cache instead of
    recompiling a fresh closure per call."""
    (env_state, _), metrics = srb_env.rollout(
        robot_b, mpc, gait_b, cmd_b, num_ticks, solver=solver,
        auto_reset=False,
    )
    onehot = jax.nn.one_hot(ids, n_g, dtype=jnp.float32)          # (B,n_g)
    count = jnp.maximum(onehot.sum(axis=0), 1.0)
    per = lambda v: (v @ onehot) / count                          # (B,)->(n_g,)

    tail = metrics["vel_err"][-num_ticks // 4:]
    upright_tail = metrics["upright"][-num_ticks // 4:]
    alive = (
        (env_state.pos[:, 2] > 0.1)
        & (env_state.pos[:, 2] < 1.0)
        & (upright_tail.min(axis=0) > 0.6)
        & ~metrics["diverged"].any(axis=0)
    ).astype(jnp.float32)
    return env_state, {
        "survival_frac": per(alive),
        "mean_vel_err": per(tail.mean(axis=0)),
        "fwd_disp_m": per(env_state.pos[:, 0]),
    }


def gait_sweep(
    robot_b: RobotParams,
    mpc: MpcParams,
    names: list[str],
    num_ticks: int,
    mesh=None,
    solver: str = ctrl.DEFAULT_SOLVER,
):
    """Closed-loop mixed-gait sweep with per-gait survival/tracking stats.

    Rolls a batch cycling through ``names`` in the SRB env and reduces the
    metrics segment-wise by gait id (one-hot matmul — a collective-friendly
    reduction under a sharded jit).  Returns ``(env_state, per_gait)`` where
    ``per_gait[name]`` holds scalar ``survival_frac`` / ``mean_vel_err`` /
    ``fwd_disp_m`` for that gait's scenarios.
    """
    B = int(jnp.shape(robot_b.mass)[0])
    gait_b, cmd_b, ids = mixed_gait_batch(names, B)
    if mesh is None:
        mesh = mesh_lib.data_mesh()
    robot_b, gait_b, cmd_b, ids = mesh_lib.shard_batch(
        (robot_b, gait_b, cmd_b, ids), mesh
    )
    env_state, stats = _gait_sweep_run(
        robot_b, mpc, gait_b, cmd_b, ids,
        num_ticks=num_ticks, n_g=len(names), solver=solver,
    )
    per_gait = {
        n: {k: float(v[i]) for k, v in stats.items()}
        for i, n in enumerate(names)
    }
    return env_state, per_gait


def randomized_robots(robot: RobotParams, batch: int, key, mass_scale=0.2, inertia_scale=0.2):
    """Domain-randomized robot batch: log-uniform mass/inertia perturbations
    (the randomization axes of BASELINE config 4)."""
    k1, k2 = jax.random.split(key)
    tile = jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + jnp.shape(x)), robot)
    mass_f = jnp.exp(jax.random.uniform(k1, (batch,), minval=-mass_scale, maxval=mass_scale))
    inertia_f = jnp.exp(
        jax.random.uniform(k2, (batch,), minval=-inertia_scale, maxval=inertia_scale)
    )
    return tile.replace(
        mass=tile.mass * mass_f,
        inertia=tile.inertia * inertia_f[:, None, None],
    )


@partial(jax.jit, static_argnames=("solver", "return_diagnostics"))
def solve_sweep_step(
    robot: RobotParams,
    mpc: MpcParams,
    x_t: jnp.ndarray,
    yaw: jnp.ndarray,
    pos_base_feet: jnp.ndarray,
    X_ref: jnp.ndarray,
    gait_table: jnp.ndarray,
    solver: str = "admm",
    return_diagnostics: bool = False,
):
    """One batched MPC solve step (jitted; shard inputs with ``shard_batch``).

    With ``return_diagnostics`` the per-scenario QP health telemetry rides
    along (SURVEY.md §5.5) — reduce it across the mesh or feed it to a
    :class:`pympc_quadruped_tpu.utils.observability.MetricsLogger`.
    """
    return engine.solve_scenarios(
        robot, mpc, x_t, yaw, pos_base_feet, X_ref, gait_table, solver=solver,
        return_diagnostics=return_diagnostics,
    )


def rollout_sweep(
    robot_b: RobotParams,
    mpc: MpcParams,
    gait_b: GaitParams,
    cmd_b: Command,
    num_ticks: int,
    mesh=None,
    solver: str = ctrl.DEFAULT_SOLVER,
):
    """Closed-loop sweep with cross-chip metric reduction.

    Returns (final_states, summary) where summary holds scalar sweep metrics
    (mean/max velocity tracking error, survival fraction) — the cross-
    scenario reductions become ICI collectives under the sharded jit.
    """
    if mesh is None:
        mesh = mesh_lib.data_mesh()
    robot_b, gait_b, cmd_b = mesh_lib.shard_batch((robot_b, gait_b, cmd_b), mesh)

    @partial(jax.jit, static_argnames=())
    def run(robot_b, gait_b, cmd_b):
        (env_state, carry), metrics = srb_env.rollout(
            robot_b, mpc, gait_b, cmd_b, num_ticks, solver=solver
        )
        # Steady-state window: last quarter of the rollout.
        tail = metrics["vel_err"][-num_ticks // 4 :]
        upright_tail = metrics["upright"][-num_ticks // 4 :]
        alive = (
            (env_state.pos[:, 2] > 0.1)
            & (env_state.pos[:, 2] < 1.0)
            & (upright_tail.min(axis=0) > 0.6)
        )
        summary = {
            "mean_vel_err": jnp.mean(tail),         # all-reduce over ICI
            "max_vel_err": jnp.max(tail),
            "survival_frac": jnp.mean(alive.astype(jnp.float32)),
        }
        return env_state, summary

    return run(robot_b, gait_b, cmd_b)
