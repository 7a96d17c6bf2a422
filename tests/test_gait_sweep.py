"""BASELINE config 3: the closed-loop multi-gait sweep.

The reference's showcase feature is its gait library (ref
``linear_mpc/gait.py:16-22``; any gait can drive the MuJoCo app, ref
``scripts/mujoco_aliengo.py:176``) — but it only ever demonstrates one gait
at a time, one robot at a time.  Here a single vmapped SRB rollout advances a
batch mixing trotting10 / pacing10 / bounding8 in lockstep and asserts each
gait actually locomotes closed-loop.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.parallel import sweep

NAMES = ["trotting10", "pacing10", "bounding8"]
TICKS = 3000  # 3 s sim: >= 7 full cycles of the slowest gait (bounding8)


@pytest.fixture(scope="module")
def per_gait():
    B = 24  # 8 scenarios per gait
    robot_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), aliengo()
    )
    _, stats = sweep.gait_sweep(robot_b, MpcParams(horizon=10), NAMES, TICKS)
    return stats


@pytest.mark.parametrize("name", NAMES)
def test_gait_survives_and_tracks(per_gait, name):
    s = per_gait[name]
    assert s["survival_frac"] == 1.0, s
    # Steady-state tracking: within 0.3 m/s of the commanded velocity
    # (trot measures ~0.06, pace ~0.12, bound ~0.15 — bar leaves margin).
    assert s["mean_vel_err"] < 0.3, s


@pytest.mark.parametrize("name", NAMES)
def test_gait_actually_locomotes(per_gait, name):
    # Forward displacement at >= 60% of command * time: pace and bound must
    # genuinely walk, not survive by standing still.
    vx = sweep.GAIT_SWEEP_VX[name]
    expect = vx * TICKS * 1e-3
    assert per_gait[name]["fwd_disp_m"] > 0.6 * expect, (per_gait[name], expect)


def test_mixed_batch_matches_uniform_batch():
    """A scenario's trajectory must not depend on its batch neighbors: row i
    of the mixed-gait batch is bitwise identical to row i of a same-shaped
    batch running only that gait (same compiled program, different neighbor
    data — any cross-scenario leakage would show here)."""
    from pympc_quadruped_tpu.env import srb_env

    mpc = MpcParams(horizon=10)
    B = len(NAMES)
    robot_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), aliengo()
    )
    gait_b, cmd_b, ids = sweep.mixed_gait_batch(NAMES, B)
    (mixed, _), _ = srb_env.rollout(
        robot_b, mpc, gait_b, cmd_b, num_ticks=200, auto_reset=False
    )
    for i, name in enumerate(NAMES):
        g_u, c_u, _ = sweep.mixed_gait_batch([name], B)
        (uniform, _), _ = srb_env.rollout(
            robot_b, mpc, g_u, c_u, num_ticks=200, auto_reset=False
        )
        np.testing.assert_array_equal(
            np.asarray(mixed.pos[i]), np.asarray(uniform.pos[i]), err_msg=name
        )


@pytest.mark.parametrize("robot_name,vx,trough_min", [
    ("aliengo", 0.4, 0.19),
    ("a1", 0.3, 0.25),
])
def test_jumping16_survives_with_flight_aware_reference(robot_name, vx, trough_min):
    """JUMPING16 — the gait the reference defines but never demonstrates
    anywhere (ref linear_mpc/gait.py:19) — survives closed-loop in the SRB
    env under the r4 flight-aware reference (ballistic z/vz rows during
    full-flight horizon steps + takeoff-velocity ramp in stance,
    refmpc._flight_rows), for BOTH robots.  Survival uses the sweep's own
    criteria over 8 jittered scenarios; the vanilla constant-height
    reference rides the trough near the ground and fails (r4 scale sweep,
    FLIGHT_APEX_SCALE docstring)."""
    import numpy as np
    from pympc_quadruped_tpu.env import srb_env
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import a1, aliengo

    B = 8
    mpc = MpcParams(horizon=16)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo() if robot_name == "aliengo" else a1())
    gait = tile(Gaits.jumping16())
    cmd = tile(Command.trot_forward(vx))
    s0 = jax.vmap(srb_env.default_init_state)(robot)
    rng = np.random.default_rng(5)
    dp = np.zeros((B, 3), np.float32)
    dp[1:, :2] = rng.uniform(-0.01, 0.01, (B - 1, 2))
    s0 = s0.replace(pos=s0.pos + jnp.asarray(dp))
    (state, _), m = srb_env.rollout(
        robot, mpc, gait, cmd, num_ticks=2000, auto_reset=False,
        cmd_ramp_ticks=500, init_state=s0,
    )
    up = np.asarray(m["upright"])
    h = np.asarray(m["height"])
    alive = (
        (np.asarray(state.pos[:, 2]) > 0.1)
        & (np.asarray(state.pos[:, 2]) < 1.0)
        & (up[-500:].min(axis=0) > 0.6)
        & ~np.asarray(m["diverged"]).any(axis=0)
    )
    assert alive.mean() >= 0.9, f"survival {alive.mean():.2f}"
    # It actually FLIES: the height oscillation spans a real hop, not a
    # crouch (trough above half the desired height, apex above it).
    assert h.min() > trough_min and h.max() > 0.45, (h.min(), h.max())
    # And it locomotes under the velocity command.
    assert np.asarray(state.pos[:, 0]).min() > 0.3


def _chunked_transition(gait_plan, horizon, vx):
    from pympc_quadruped_tpu.env import srb_env
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.robots import aliengo

    B = 2
    mpc = MpcParams(horizon=horizon)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    cmd = tile(Command.trot_forward(vx))
    state, carry, tick0 = None, None, 0
    out = []
    for gname, ticks in gait_plan:
        gait = tile(Gaits.by_name(gname))
        (state, carry), m = srb_env.rollout(
            robot, mpc, gait, cmd, num_ticks=ticks,
            init_state=state, carry_in=carry, tick0=tick0,
            return_full_carry=True, auto_reset=False,
        )
        tick0 += ticks
        out.append((gname, m))
    return state, out


def test_gait_transitions_mid_run():
    """LIVE gait transitions: trot -> pace -> trot through the chunked
    rollout API (full controller state threaded across the switch — warm
    starts, swing latches, desired-position integrators).  The reference
    cannot switch gaits at all mid-run (its Gait enum instance is fixed at
    construction, ref ``mujoco_aliengo.py:176``); here a transition is just
    a chunk boundary with different gait data."""
    _, chunks = _chunked_transition(
        [("trotting10", 1000), ("pacing10", 1000), ("trotting10", 1000)],
        horizon=10, vx=0.8,
    )
    for gname, m in chunks:
        up = np.asarray(m["upright"])
        assert not np.asarray(m["diverged"]).any(), gname
        assert up.min() > 0.95, f"{gname}: up_min {up.min():.3f}"
        assert np.asarray(m["vel_err"])[-300:].mean() < 0.2, gname


def test_trot_jump_trot_transition():
    """A trotting robot transitions INTO jumping16 (real flight phases)
    and lands back into a clean trot — all mid-run, no reset.  Exercises
    the flight-aware reference switching on and off live (it is data-gated
    per solve tick by the stance table, refmpc._flight_rows)."""
    state, chunks = _chunked_transition(
        [("trotting16", 1200), ("jumping16", 1280), ("trotting16", 1200)],
        horizon=16, vx=0.4,
    )
    for gname, m in chunks:
        up = np.asarray(m["upright"])
        assert not np.asarray(m["diverged"]).any(), gname
        assert up.min() > 0.95, f"{gname}: up_min {up.min():.3f}"
    # The jump chunk actually flew; the final trot chunk re-settled.
    h_jump = np.asarray(chunks[1][1]["height"])
    assert h_jump.max() > 0.45 and h_jump.min() > 0.25
    ve_final = np.asarray(chunks[2][1]["vel_err"])[-300:].mean()
    assert ve_final < 0.1, ve_final
    assert np.asarray(state.pos[:, 0]).min() > 1.0
