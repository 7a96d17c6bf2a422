"""Gait schedule tests: JAX pure functions vs the float64 oracle, all gaits.

The oracle transcribes the reference's phase machine semantics
(ref linear_mpc/gait.py:76-135); equality here over full gait cycles pins the
TPU implementation to it exactly (tables are binary, so equality is exact).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.ops import gaitsched
from pympc_quadruped_tpu.oracle import npref

GAITS = {
    "trotting10": (Gaits.trotting10, npref.OracleGait.trotting10),
    "trotting16": (Gaits.trotting16, npref.OracleGait.trotting16),
    "standing": (Gaits.standing, npref.OracleGait.standing),
    "pacing10": (Gaits.pacing10, npref.OracleGait.pacing10),
}


@pytest.mark.parametrize("name", list(GAITS))
def test_gait_table_matches_oracle(name):
    jg, og = GAITS[name]
    mpc = MpcParams(horizon=16)
    ocfg = npref.OracleConfig(horizon=16)
    table_fn = jax.jit(lambda t: gaitsched.gait_table(jg(), mpc, t))
    # Cover two full gait cycles at a stride of 7 ticks (hits odd phases).
    for tick in range(0, 2 * 20 * 16, 7):
        got = np.asarray(table_fn(jnp.int32(tick)))
        want = npref.gait_table(og(), ocfg, tick)
        np.testing.assert_array_equal(got, want, err_msg=f"{name} tick={tick}")


@pytest.mark.parametrize("name", list(GAITS))
def test_swing_state_matches_oracle(name):
    jg, og = GAITS[name]
    mpc = MpcParams(horizon=16)
    ocfg = npref.OracleConfig(horizon=16)
    fn = jax.jit(lambda t: gaitsched.swing_state(jg(), mpc, t))
    for tick in range(0, 2 * 20 * 16, 3):
        got = np.asarray(fn(jnp.int32(tick)))
        want = npref.swing_state(og(), ocfg, tick)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"{name} tick={tick}")


def test_trotting10_structure():
    """TROTTING10: diagonal pairs alternate; table row counts stance legs = 2."""
    mpc = MpcParams(horizon=10)
    gait = Gaits.trotting10()
    table = np.asarray(gaitsched.gait_table(gait, mpc, jnp.int32(0))).reshape(10, 4)
    # Diagonal pairs (FL,RR) and (FR,RL) are always synchronized.
    np.testing.assert_array_equal(table[:, 0], table[:, 3])
    np.testing.assert_array_equal(table[:, 1], table[:, 2])
    # Exactly one pair in stance per step for a trot.
    assert np.all(table.sum(axis=1) == 2)


def test_swing_stance_times():
    mpc = MpcParams(horizon=10)
    gait = Gaits.trotting10()
    # dt_gait = 0.001 * 20 = 0.02 s; 5 segments swing/stance each -> 0.1 s.
    assert float(gaitsched.swing_time(gait, mpc)) == pytest.approx(0.1)
    assert float(gaitsched.stance_time(gait, mpc)) == pytest.approx(0.1)


def test_gait_params_vmap():
    """Gaits with equal num_segments batch under vmap (the gait-sweep axis)."""
    mpc = MpcParams(horizon=10)
    g1, g2 = Gaits.trotting10(), Gaits.pacing10()
    batched = jax.tree.map(lambda a, b: jnp.stack([a, b]), g1, g2)
    out = jax.vmap(lambda g: gaitsched.gait_table(g, mpc, jnp.int32(40)))(batched)
    np.testing.assert_array_equal(
        np.asarray(out[0]), np.asarray(gaitsched.gait_table(g1, mpc, jnp.int32(40)))
    )
    np.testing.assert_array_equal(
        np.asarray(out[1]), np.asarray(gaitsched.gait_table(g2, mpc, jnp.int32(40)))
    )
