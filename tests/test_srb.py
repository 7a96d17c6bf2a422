"""SRB model tests: structure of (Ac, Bc) and exact ZOH vs scipy expm.

The discretization claim (Ac nilpotent with Ac^3 = 0, series terminates) is
verified against the reference's method — ``expm`` of the 25x25 embedding
(ref linear_mpc/mpc.py:194-208) — in float64.
"""
import numpy as np
from scipy.linalg import expm

import jax.numpy as jnp

from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.ops import srb

R_FEET = np.array(
    [
        [0.29, 0.13, -0.40],
        [0.29, -0.14, -0.41],
        [-0.19, 0.13, -0.42],
        [-0.19, -0.13, -0.40],
    ]
)


def test_ac_nilpotent():
    Ac, _ = srb.state_space(aliengo(), jnp.float32(0.37), jnp.asarray(R_FEET, jnp.float32))
    Ac = np.asarray(Ac, dtype=np.float64)
    assert np.max(np.abs(Ac @ Ac @ Ac)) < 1e-12


def test_discretize_matches_expm():
    yaw = 0.37
    Ac, Bc = srb.state_space(aliengo(), jnp.float32(yaw), jnp.asarray(R_FEET, jnp.float32))
    Ad, Bd = srb.discretize(Ac, Bc, jnp.float32(0.05))

    Ac64 = np.asarray(Ac, np.float64)
    Bc64 = np.asarray(Bc, np.float64)
    blk = np.zeros((25, 25))
    blk[:13, :13] = Ac64 * 0.05
    blk[:13, 13:] = Bc64 * 0.05
    M = expm(blk)
    # float32 state-space build vs float64 expm: agreement to f32 rounding.
    np.testing.assert_allclose(np.asarray(Ad), M[:13, :13], atol=1e-5)
    np.testing.assert_allclose(np.asarray(Bd), M[:13, 13:], atol=1e-5)


def test_bc_force_rows():
    robot = aliengo()
    _, Bc = srb.state_space(robot, jnp.float32(0.0), jnp.asarray(R_FEET, jnp.float32))
    Bc = np.asarray(Bc)
    for leg in range(4):
        np.testing.assert_allclose(
            Bc[9:12, 3 * leg : 3 * leg + 3],
            np.eye(3) / float(robot.mass),
            atol=1e-7,
        )
    # Unactuated rows (angles, positions, gravity) are zero.
    np.testing.assert_allclose(Bc[0:6], 0.0, atol=0.0)
    np.testing.assert_allclose(Bc[12], 0.0, atol=0.0)


def test_torque_rows_zero_yaw():
    """At yaw=0 the torque block must be inv(I) @ skew(r)."""
    robot = aliengo()
    _, Bc = srb.state_space(robot, jnp.float32(0.0), jnp.asarray(R_FEET, jnp.float32))
    inv_I = np.linalg.inv(np.asarray(robot.inertia, np.float64))
    for leg in range(4):
        r = R_FEET[leg]
        sk = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
        block = inv_I @ sk
        np.testing.assert_allclose(
            np.asarray(Bc[6:9, 3 * leg : 3 * leg + 3]),
            block,
            atol=1e-4 * max(1.0, np.max(np.abs(block))),
        )
