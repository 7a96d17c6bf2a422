"""Unit tests for the Lie/rotation utilities vs scipy and round-trips."""
import numpy as np
import pytest

import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from pympc_quadruped_tpu.ops import lie


RNG = np.random.default_rng(0)


def random_quat():
    q = RNG.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return q


@pytest.mark.parametrize("trial", range(5))
def test_quat_to_rotmat_vs_scipy(trial):
    q = random_quat()
    R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    R_scipy = Rotation.from_quat(np.roll(q, -1)).as_matrix()  # scipy is xyzw
    np.testing.assert_allclose(R, R_scipy, atol=1e-6)


@pytest.mark.parametrize("trial", range(5))
def test_quat_to_zyx_vs_scipy(trial):
    q = random_quat()
    rpy = np.asarray(lie.quat_to_zyx(jnp.asarray(q)))
    # R = Rz(yaw) Ry(pitch) Rx(roll) == scipy extrinsic 'xyz' with angles
    # returned as [roll, pitch, yaw].
    rpy_scipy = Rotation.from_quat(np.roll(q, -1)).as_euler("xyz")
    np.testing.assert_allclose(rpy, rpy_scipy, atol=1e-6)


def test_zyx_roundtrip():
    rpy = np.array([0.3, -0.2, 1.1])
    R = lie.zyx_to_rotmat(jnp.asarray(rpy))
    q = lie.rotmat_to_quat(R)
    rpy_back = np.asarray(lie.quat_to_zyx(q))
    np.testing.assert_allclose(rpy_back, rpy, atol=1e-5)


def test_skew_cross_equivalence():
    a = RNG.normal(size=3)
    b = RNG.normal(size=3)
    lhs = np.asarray(lie.skew(jnp.asarray(a)) @ jnp.asarray(b))
    np.testing.assert_allclose(lhs, np.cross(a, b), rtol=1e-6)


def test_rot_z_matches_exp_so3():
    theta = 0.7
    Rz = np.asarray(lie.rot_z(jnp.float32(theta)))
    Re = np.asarray(lie.exp_so3(jnp.array([0.0, 0.0, 1.0]), jnp.float32(theta)))
    np.testing.assert_allclose(Rz, Re, atol=1e-6)


def test_quat_integrate_small_angle():
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    omega = jnp.array([0.0, 0.0, 2.0])  # yaw rate
    q1 = q0
    for _ in range(100):
        q1 = lie.quat_integrate(q1, omega, jnp.float32(0.001))
    rpy = np.asarray(lie.quat_to_zyx(q1))
    np.testing.assert_allclose(rpy[2], 0.2, atol=1e-4)
