"""The package-wide ordering contract, tested explicitly (SURVEY §2.5).

The reference has a latent cross-ordering hazard: its URDFs declare joints
FR-first while its code indexes FL-first everywhere (ref aliengo.urdf:98 vs
robot_data.py:118, leg_controller.py:85-90).  This framework's contract:
legs FL, FR, RL, RR; joints (hip, thigh, calf) per leg; quaternions wxyz.
Everything that serializes an ordering — the MJCF generator's joints,
actuators and sensors, the gait table layout, the observation vector — is
pinned here.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import LEG_NAMES, aliengo
from pympc_quadruped_tpu.env import mjcf
from pympc_quadruped_tpu.ops import gaitsched, lie


def test_leg_name_order():
    assert LEG_NAMES == ("FL", "FR", "RL", "RR")


def test_hip_offsets_follow_leg_order():
    hips = np.asarray(aliengo().hip_offset)
    # FL: +x +y, FR: +x -y, RL: -x +y, RR: -x -y.
    signs = np.sign(hips[:, :2])
    np.testing.assert_array_equal(
        signs, [[1, 1], [1, -1], [-1, 1], [-1, -1]]
    )


def test_mjcf_orderings():
    import mujoco

    m = mujoco.MjModel.from_xml_string(mjcf.model_xml("aliengo"))
    joints = [m.joint(i).name for i in range(1, m.njnt)]  # skip free joint
    expect = [f"{n}_{j}_joint" for n in LEG_NAMES for j in ("hip", "thigh", "calf")]
    assert joints == expect
    actuators = [m.actuator(i).name for i in range(m.nu)]
    assert actuators == [f"{n}_{j}" for n in LEG_NAMES for j in ("hip", "thigh", "calf")]
    # Sensor layout contract: framequat(4), gyro(3), accel(3), 12 q, 12 qd, 4 touch.
    sizes = [m.sensor(i).dim[0] for i in range(m.nsensor)]
    assert sizes[:3] == [4, 3, 3]
    assert sum(sizes) == 38


def test_gait_table_is_step_major():
    """Table entry layout: (horizon step, leg) row-major (ref gait.py:81-100)."""
    mpc = MpcParams(horizon=10)
    gait = Gaits.trotting10()
    table = np.asarray(gaitsched.gait_table(gait, mpc, jnp.int32(0))).reshape(10, 4)
    # TROTTING10: diagonal pairs (FL,RR) vs (FR,RL) always alternate within
    # a step row — that only holds under step-major layout (a leg-major
    # reshape would scramble the pairs).
    for row in table:
        assert row[0] == row[3] and row[1] == row[2]
        assert row[0] != row[1]
    # Rows advance one gait segment per horizon step: 5-stance runs.
    runs = np.diff(np.flatnonzero(np.diff(table[:, 0])))
    assert np.all(runs == 5), table[:, 0]


def test_quaternion_convention_wxyz():
    """lie.quat_to_rotmat consumes (w,x,y,z) — MuJoCo order."""
    pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    q_xyzw = Rotation.random(5, rng).as_quat()  # scipy returns xyzw
    q_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, :3]], axis=1)
    R_ours = np.asarray(
        jax.vmap(lie.quat_to_rotmat)(jnp.asarray(q_wxyz, jnp.float32))
    )
    R_scipy = Rotation.from_quat(q_xyzw).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-6)
