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


# ---------------------------------------------------------------------------
# SE(3) / product-of-exponentials sublibrary (ref utils/kinematics.py:188-306
# — shipped but never called by the reference's controllers; completed for
# migration parity).  Oracle: scipy.linalg.expm of the 4x4 se(3) matrix in
# float64, a genuinely independent route to the same transforms.
# ---------------------------------------------------------------------------


def _expm_se3(S, theta):
    import scipy.linalg

    m = np.zeros((4, 4))
    m[:3, :3] = np.asarray(lie.skew(jnp.asarray(S[:3])))
    m[:3, 3] = S[3:]
    return scipy.linalg.expm(m * theta)


@pytest.mark.parametrize("trial", range(4))
def test_exp_se3_vs_scipy_expm(trial):
    S = RNG.normal(size=6)
    theta = float(RNG.normal())
    got = np.asarray(lie.exp_se3(jnp.asarray(S, jnp.float32), jnp.float32(theta)))
    np.testing.assert_allclose(got, _expm_se3(S, theta), atol=1e-5)


def test_exp_se3_pure_translation():
    # The reference's second branch (||omega||=0, ||v||=1): straight-line
    # motion, identity rotation (ref kinematics.py:254-257).
    S = np.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0])
    got = np.asarray(lie.exp_se3(jnp.asarray(S, jnp.float32), jnp.float32(0.3)))
    exp = np.eye(4)
    exp[0, 3] = 0.3
    np.testing.assert_allclose(got, exp, atol=1e-7)


def test_inv_se3_and_rp_roundtrip():
    q = random_quat()
    R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    p = RNG.normal(size=3)
    T = np.asarray(lie.rp_to_se3(jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32)))
    Ti = np.asarray(lie.inv_se3(jnp.asarray(T)))
    np.testing.assert_allclose(T @ Ti, np.eye(4), atol=1e-5)


def test_adjoint_composition():
    # Ad(T1 T2) = Ad(T1) Ad(T2) — the defining homomorphism property
    # (checks the [p]x R block of ref kinematics.py:200-224).
    Ts = []
    for _ in range(2):
        q = random_quat()
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
        p = RNG.normal(size=3)
        Ts.append(np.asarray(lie.rp_to_se3(jnp.asarray(R, jnp.float32),
                                           jnp.asarray(p, jnp.float32))))
    ad12 = np.asarray(lie.adjoint_se3(jnp.asarray(Ts[0] @ Ts[1])))
    ad1 = np.asarray(lie.adjoint_se3(jnp.asarray(Ts[0])))
    ad2 = np.asarray(lie.adjoint_se3(jnp.asarray(Ts[1])))
    np.testing.assert_allclose(ad12, ad1 @ ad2, atol=1e-4)
    np.testing.assert_allclose(
        ad1, np.asarray(lie.adjoint_rp(jnp.asarray(Ts[0][:3, :3]),
                                       jnp.asarray(Ts[0][:3, 3]))), atol=1e-6)


def test_twist_to_se3_layout():
    tw = RNG.normal(size=6)
    m = np.asarray(lie.twist_to_se3(jnp.asarray(tw, jnp.float32)))
    np.testing.assert_allclose(m[:3, :3], np.asarray(lie.skew(jnp.asarray(tw[:3]))), atol=1e-6)
    np.testing.assert_allclose(m[:3, 3], tw[3:], atol=1e-6)
    np.testing.assert_allclose(m[3], 0.0, atol=0)


def test_fk_open_chain_planar_2link():
    # Independent hand oracle: planar 2R arm, link lengths 1 and 1, joints
    # about +z at x=0 and x=1, home = end at (2,0,0).  Classic PoE example.
    L1, L2 = 1.0, 1.0
    z = np.array([0.0, 0.0, 1.0])
    s1 = np.asarray(lie.screw_axis(jnp.asarray(z), jnp.zeros(3)))
    s2 = np.asarray(lie.screw_axis(jnp.asarray(z), jnp.array([L1, 0.0, 0.0])))
    home = np.eye(4)
    home[0, 3] = L1 + L2
    for t1, t2 in [(0.0, 0.0), (np.pi / 2, 0.0), (0.3, -0.8)]:
        T = np.asarray(lie.fk_open_chain(
            jnp.asarray(home, jnp.float32),
            jnp.asarray(np.stack([s1, s2]), jnp.float32),
            jnp.asarray([t1, t2], jnp.float32)))
        x = L1 * np.cos(t1) + L2 * np.cos(t1 + t2)
        y = L1 * np.sin(t1) + L2 * np.sin(t1 + t2)
        np.testing.assert_allclose(T[:3, 3], [x, y, 0.0], atol=1e-5)
        np.testing.assert_allclose(T[:3, :3] @ [1, 0, 0],
                                   [np.cos(t1 + t2), np.sin(t1 + t2), 0.0],
                                   atol=1e-5)


def test_fk_open_chain_matches_leg_fk():
    # The PoE route must agree with the closed-form 3-DoF leg FK in
    # ops/kin.py on the real robot geometry (two independent derivations).
    from pympc_quadruped_tpu.models.robots import aliengo
    from pympc_quadruped_tpu.ops import kin

    robot = aliengo()
    q = jnp.asarray(RNG.uniform(-1.0, 1.0, size=3), jnp.float32)
    p_ref, _ = kin.leg_forward_kinematics(robot, jnp.tile(q, (4, 1)))
    leg = 0  # FL
    hip = np.asarray(robot.hip_offset)[leg]
    l1 = float(np.asarray(robot.hip_len)[leg])  # signed abduction length
    l2, l3 = float(robot.l_thigh), float(robot.l_calf)
    sx = np.array([1.0, 0.0, 0.0])
    sy = np.array([0.0, 1.0, 0.0])
    s_hip = np.asarray(lie.screw_axis(jnp.asarray(sx), jnp.asarray(hip)))
    p_thigh = hip + np.array([0.0, l1, 0.0])
    s_thigh = np.asarray(lie.screw_axis(jnp.asarray(sy), jnp.asarray(p_thigh)))
    p_knee = p_thigh + np.array([0.0, 0.0, -l2])
    s_knee = np.asarray(lie.screw_axis(jnp.asarray(sy), jnp.asarray(p_knee)))
    home = np.eye(4)
    home[:3, 3] = p_knee + np.array([0.0, 0.0, -l3])
    T = np.asarray(lie.fk_open_chain(
        jnp.asarray(home, jnp.float32),
        jnp.asarray(np.stack([s_hip, s_thigh, s_knee]), jnp.float32),
        q))
    np.testing.assert_allclose(T[:3, 3], np.asarray(p_ref)[0], atol=1e-5)
