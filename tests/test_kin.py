"""Kinematics tests: closed-form FK/Jacobians vs MuJoCo and finite differences.

MuJoCo loads the reference MJCF directly, so it is an *independent* oracle
for the Pinocchio-replacement claims (the MJCF foot geoms sit exactly at the
URDF foot frames, see aliengo.xml:71 vs aliengo.urdf:199-200).
"""
import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pympc_quadruped_tpu.models.robots import aliengo
from pympc_quadruped_tpu.ops import kin
from pympc_quadruped_tpu.oracle import npref

FOOT_GEOMS = ["fl_foot", "fr_foot", "rl_foot", "rr_foot"]
THIGH_BODIES = ["FL_thigh", "FR_thigh", "RL_thigh", "RR_thigh"]


def mujoco_foot_positions(xml_path, ref_state):
    model = mujoco.MjModel.from_xml_path(xml_path)
    data = mujoco.MjData(model)
    data.qpos[:3] = ref_state["pos"]
    data.qpos[3:7] = ref_state["quat"]
    data.qpos[7:] = ref_state["q"]
    mujoco.mj_forward(model, data)
    feet = np.stack([data.geom(g).xpos.copy() for g in FOOT_GEOMS])
    thighs = np.stack([data.body(b).xpos.copy() for b in THIGH_BODIES])
    return feet, thighs


def make_obs(ref_state):
    return kin.RobotObs(
        pos_base=jnp.asarray(ref_state["pos"], jnp.float32),
        lin_vel_base=jnp.asarray(ref_state["vel"], jnp.float32),
        quat_base=jnp.asarray(ref_state["quat"], jnp.float32),
        ang_vel_base=jnp.asarray(ref_state["omega"], jnp.float32),
        q=jnp.asarray(ref_state["q"], jnp.float32),
        qdot=jnp.asarray(ref_state["qdot"], jnp.float32),
    )


def test_fk_matches_mujoco(ref_state, aliengo_xml_path):
    feet_mj, thighs_mj = mujoco_foot_positions(aliengo_xml_path, ref_state)
    ks = kin.compute_kin_state(aliengo(), make_obs(ref_state))
    np.testing.assert_allclose(np.asarray(ks.pos_feet), feet_mj, atol=2e-6)
    # Thigh positions: the reference uses the thigh *joint* frame
    # (ref robot_data.py:169-176); MuJoCo body frame coincides with it.
    thighs_world = ref_state["pos"] + np.asarray(
        ks.base_pos_base_thighs
    ) @ np.asarray(ks.R_base).T
    np.testing.assert_allclose(thighs_world, thighs_mj, atol=2e-6)


def test_oracle_fk_matches_mujoco(ref_state, aliengo_xml_path):
    feet_mj, _ = mujoco_foot_positions(aliengo_xml_path, ref_state)
    okin = npref.kin_update(
        npref.oracle_aliengo(),
        {
            "pos": ref_state["pos"],
            "vel": ref_state["vel"],
            "quat": ref_state["quat"],
            "omega": ref_state["omega"],
            "q": ref_state["q"],
            "qdot": ref_state["qdot"],
        },
    )
    np.testing.assert_allclose(okin.pos_feet, feet_mj, atol=1e-9)


def test_jacobian_vs_autodiff(ref_state):
    robot = aliengo()
    q_legs = jnp.asarray(ref_state["q"], jnp.float32).reshape(4, 3)

    def fk_leg(q_flat):
        p, _ = kin.leg_forward_kinematics(robot, q_flat.reshape(4, 3))
        return p

    J_auto = jax.jacfwd(fk_leg)(q_legs.reshape(-1))  # (4,3,12)
    _, J_closed = kin.leg_forward_kinematics(robot, q_legs)
    for leg in range(4):
        block = J_auto[leg, :, 3 * leg : 3 * leg + 3]
        np.testing.assert_allclose(
            np.asarray(J_closed[leg]), np.asarray(block), atol=1e-5
        )
        # Cross-leg blocks must vanish (legs are independent chains).
        mask = np.ones(12, bool)
        mask[3 * leg : 3 * leg + 3] = False
        np.testing.assert_allclose(np.asarray(J_auto[leg][:, mask]), 0.0, atol=1e-7)


def test_ik_roundtrip():
    robot = aliengo()
    rng = np.random.default_rng(3)
    for _ in range(20):
        q = np.stack(
            [
                rng.uniform(-0.5, 0.5, size=4),
                rng.uniform(0.2, 1.2, size=4),
                rng.uniform(-2.4, -0.7, size=4),
            ],
            axis=-1,
        )
        p, _ = kin.leg_forward_kinematics(robot, jnp.asarray(q, jnp.float32))
        q_back = kin.leg_inverse_kinematics(robot, p)
        np.testing.assert_allclose(np.asarray(q_back), q, atol=1e-4)


def test_jax_vs_oracle_kinstate(ref_state):
    ks = kin.compute_kin_state(aliengo(), make_obs(ref_state))
    okin = npref.kin_update(
        npref.oracle_aliengo(),
        {
            "pos": ref_state["pos"],
            "vel": ref_state["vel"],
            "quat": ref_state["quat"],
            "omega": ref_state["omega"],
            "q": ref_state["q"],
            "qdot": ref_state["qdot"],
        },
    )
    np.testing.assert_allclose(np.asarray(ks.R_base), okin.R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ks.rpy_base), okin.rpy, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ks.base_pos_base_feet), okin.p_bf, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ks.base_vel_base_feet), okin.vel_rel_base, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ks.base_pos_base_thighs), okin.thighs, atol=1e-6
    )


def test_vmap_batching(ref_state):
    robot = aliengo()
    obs = make_obs(ref_state)
    batched_obs = jax.tree.map(lambda x: jnp.stack([x, x + 0.001]), obs)
    batched_robot = jax.tree.map(lambda x: jnp.stack([x, x]), robot)
    out = jax.vmap(kin.compute_kin_state)(batched_robot, batched_obs)
    single = kin.compute_kin_state(robot, obs)
    np.testing.assert_allclose(
        np.asarray(out.pos_feet[0]), np.asarray(single.pos_feet), atol=1e-6
    )
