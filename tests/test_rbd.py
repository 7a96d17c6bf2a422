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


def _jittered_init(robot_b, B, seed, cp=None, terrain=None):
    """Batch of initial states with small physical jitters (cm-scale pose,
    cm/s-scale velocity) around the nominal stance.

    The closed-loop gates below run B jittered scenarios and require a
    PASS BAND (>= B-1 of B) instead of pinning one trajectory: a 1e-7
    rounding change in any op moves stumble timing on a single knife-edge
    trajectory (r3 measured, docs/performance.md), but a controller that is
    actually stable clears a +-1 cm perturbation band — behavior is gated,
    not the bit pattern."""
    fr = None if cp is None else cp.foot_radius
    if terrain is not None:
        state0 = jax.vmap(
            lambda r, t: fullorder.init_state_on_terrain(r, t, fr)
        )(robot_b, terrain)
    else:
        state0 = jax.vmap(lambda r: fullorder.default_init_state(r, fr))(robot_b)
    rng = np.random.default_rng(seed)
    dpos = np.zeros((B, 3), np.float32)
    dpos[1:, :2] = rng.uniform(-0.01, 0.01, (B - 1, 2))   # scenario 0 = nominal
    dpos[1:, 2] = rng.uniform(-0.003, 0.003, B - 1)
    dq = np.zeros((B, 12), np.float32)
    dq[1:] = rng.uniform(-0.01, 0.01, (B - 1, 12))
    du = np.zeros((B, 18), np.float32)
    du[1:] = rng.uniform(-0.02, 0.02, (B - 1, 18))
    return state0.replace(
        pos=state0.pos + jnp.asarray(dpos),
        q=state0.q + jnp.asarray(dq),
        u=state0.u + jnp.asarray(du),
    )


def _per_scenario(metrics, key, tail=None):
    """(B,) per-scenario reduction of a stacked (T,B) metric window."""
    a = np.asarray(metrics[key])
    return a if tail is None else a[-tail:]


def _pass_band(ok, need):
    assert int(np.sum(ok)) >= need, f"only {int(np.sum(ok))} of {ok.size} scenarios pass: {ok}"


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


def test_a1_fullorder_closed_loop_trot():
    """A1 trots on-device in the full-order env under :func:`a1_env_config`
    — the on-TPU analog of the reference's 4xA1 IsaacGym entry point
    (ref ``scripts/isaacgym_a1.py:57-183``), with the real 33.5 N*m
    hardware torque clamp the reference never applies."""
    B = 4
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot1, cp = fullorder.a1_env_config()
    robot = tile(robot1)
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(0.8))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=3000, cp=cp, spec=mjcf.a1_spec(),
        cmd_ramp_ticks=800, state0=_jittered_init(robot, B, seed=21, cp=cp),
    )
    h = _per_scenario(metrics, "height", 500).mean(axis=0)
    v = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    ok = (
        (h > 0.28) & (h < 0.40) & (v < 0.15) & (up > 0.9)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
        & (np.asarray(state.pos[:, 0]) > 1.0)
    )
    _pass_band(ok, B - 1)


def test_fullorder_rough_terrain_trot():
    """Terrain-aware contact (feature parity with srb_env and the
    reference's heightfield path, ref ``utils/isaacgym_utils.py:267-312``):
    Aliengo trots across 2 cm random-rough ground in the articulated env."""
    from pympc_quadruped_tpu.env import terrain as terrain_lib

    B = 4
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(0.8))
    terr = tile(terrain_lib.random_rough(jax.random.PRNGKey(11), amplitude=0.02))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=2000, terrain=terr,
        state0=_jittered_init(robot, B, seed=22, terrain=terr),
    )
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    ok = (
        (up > 0.9)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
        & (np.asarray(state.pos[:, 0]) > 0.8)
    )
    _pass_band(ok, B - 1)


def test_fullorder_kf_measured_contact_drive():
    """The estimator closes the loop on the articulated dynamics with
    MEASURED foot-contact gating (normal force > 1 N) — real contact
    timing, not the gait plan (the failure mode the MuJoCo harness hit
    with planned-stance gating)."""
    from pympc_quadruped_tpu.estimation import kf

    B = 4
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(0.8))
    est = kf.KfParams.default().replace(contact_height=jnp.float32(0.0255))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=2000,
        estimator=est, key=jax.random.PRNGKey(5),
        state0=_jittered_init(robot, B, seed=23),
    )
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    ve = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    ok = (
        (up > 0.9) & (ve < 0.25)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
        & (_per_scenario(metrics, "est_vel_err", 500).mean(axis=0) < 0.35)
        & (np.asarray(metrics["est_pos_err"])[-1] < 0.35)
    )
    _pass_band(ok, B - 1)
    # est_vel_err bar is wider than the SRB env's (test_kf.py): the
    # articulated accelerometer carries real touchdown-impact spikes.
    # est_pos_err asserts BOUNDED drift only: penalty-contact feet creep
    # under load, so leg odometry drifts ~13% of distance; the controller
    # is insensitive (position error clamped +-0.1 m, ref mpc.py:121-137).


def test_fullorder_auto_reset_recovers_poisoned_scenario():
    """Per-scenario divergence auto-reset (same contract as
    test_env_aux.py's SRB version): a NaN-poisoned scenario is flagged and
    snapped back every tick, while its well-posed neighbor keeps trotting
    untouched."""
    B = 2
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    # 1.2 m/s: the reference's demonstrated Aliengo operating point (the env
    # has a resonant instability band near 1.0 m/s; 0.8 and 1.2 are stable).
    cmd = tile(Command.trot_forward(1.2))
    state0 = jax.vmap(lambda r: fullorder.default_init_state(r))(robot)
    state0 = state0.replace(u=state0.u.at[1, 3].set(jnp.nan))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=1500, state0=state0, auto_reset=True
    )
    div = np.asarray(metrics["diverged"])
    up = np.asarray(metrics["upright"])
    assert not div[:, 0].any(), "well-posed scenario must not reset"
    assert div[:, 1].any(), "poisoned scenario should be flagged"
    assert np.all(np.isfinite(np.asarray(state.pos)))
    assert up[-300:, 0].min() > 0.9, "well-posed scenario degraded by neighbor"


def test_fullorder_step_transient_envelope():
    """The r3 finding pinned: the standstill->speed STEP is the only
    fragile phase of the full-order trot (steady state is stable at every
    speed 0.6-1.4).  A 0.5 s command ramp (``Command.ramped``) restores
    robust margins at the worst-case step speed (1.0 m/s tips over when
    stepped; MuJoCo's implicit solver absorbs the same step)."""
    B = 5
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(1.0))
    (_, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=2500, cmd_ramp_ticks=500,
        state0=_jittered_init(robot, B, seed=24),
    )
    up = _per_scenario(metrics, "upright").min(axis=0)
    ve = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    ok = (
        (up > 0.95) & (ve < 0.1)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
    )
    _pass_band(ok, B - 1)


def test_fullorder_closed_loop_bound():
    """BOUNDING holds up under full articulated physics — front/rear pair
    landings with real leg dynamics.  The contact default kn = 1e4 is what
    makes this work (see ContactParams.kn); the reference ships bounding
    commented out entirely (ref gait.py:20) and never demonstrates any
    non-trot gait in a physics simulator."""
    B = 4
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.by_name("bounding8"))
    cmd = tile(Command.trot_forward(0.6))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=3000, cmd_ramp_ticks=500,
        state0=_jittered_init(robot, B, seed=25),
    )
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    ve = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    h = _per_scenario(metrics, "height", 500).mean(axis=0)
    ok = (
        (up > 0.9) & (h > 0.3) & (h < 0.45) & (ve < 0.2)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
        & (np.asarray(state.pos[:, 0]) > 1.0)
    )
    _pass_band(ok, B - 1)


def test_fullorder_closed_loop_pace():
    """PACING holds up under full articulated physics (lateral leg pairs —
    dynamically unstable in roll between steps).  The reference never
    demonstrates any non-trot gait in a physics simulator (bounding ships
    commented out entirely, ref gait.py:20 — it runs here too, see
    test_fullorder_closed_loop_bound)."""
    B = 4
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.by_name("pacing10"))
    cmd = tile(Command.trot_forward(0.8))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=3000, cmd_ramp_ticks=500,
        state0=_jittered_init(robot, B, seed=26),
    )
    up = _per_scenario(metrics, "upright").min(axis=0)
    ve = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    ok = (
        (up > 0.95) & (ve < 0.15)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
        & (np.asarray(state.pos[:, 0]) > 1.5)
    )
    _pass_band(ok, B - 1)


def test_fullorder_closed_loop_trot():
    """The torque-driven full-order loop holds a 1.2 m/s trot — the
    capability the reference delegates to IsaacGym, batched on device."""
    B = 5
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(1.2))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=1500,
        state0=_jittered_init(robot, B, seed=27),
    )
    h = _per_scenario(metrics, "height", 500).mean(axis=0)
    v = _per_scenario(metrics, "vel_err", 500).mean(axis=0)
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    # Finiteness is part of the per-scenario criteria (a global assert
    # would let one divergent jitter fail the whole band).
    finite = np.isfinite(np.asarray(metrics["height"])).all(axis=0)
    ok = (
        finite & (h > 0.33) & (h < 0.42) & (v < 0.15) & (up > 0.9)
        & (np.asarray(state.pos[:, 0]) > 1.0)
    )
    _pass_band(ok, B - 1)


def test_fullorder_turning_trot():
    """Yaw-rate command end-to-end in the articulated env: the robot walks
    a curved path (the reference only ever commands straight lines in its
    sims; yaw-rate handling exists in its MPC, ref mpc.py:83-92)."""
    B = 4
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot = tile(aliengo())
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(0.8).replace(yaw_turn_rate=jnp.float32(0.5)))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=4000, cmd_ramp_ticks=500,
        state0=_jittered_init(robot, B, seed=28),
    )
    up = _per_scenario(metrics, "upright", 500).min(axis=0)
    rpy = np.asarray(jax.vmap(lie.quat_to_zyx)(state.quat))
    # Turned substantially (tracking is sluggish through the +-0.1 m position
    # clamp, but the path must genuinely curve) and translated in BOTH axes.
    ok = (
        (up > 0.95)
        & ~np.asarray(metrics["diverged"]).any(axis=0)
        & (rpy[:, 2] > 0.5)
        & (np.asarray(state.pos[:, 0]) > 1.5)
        & (np.asarray(state.pos[:, 1]) > 0.5)
    )
    _pass_band(ok, B - 1)


def test_a1_parity_actuation_substeps():
    """The reference's exact A1 actuation (Kp=700 swing PD, no torque
    clamp, ref robot_configs.py:55 / isaacgym_a1.py:162) exceeds the
    explicit 1 ms integrator's stability margin — and ``substeps=4``
    restores finite integration (the reference's own simulators are
    implicit and absorb the stiffness).  Contract pinned here: substepped
    parity rollouts stay FINITE through whatever the dynamics do; the
    measured closed-loop envelope of this configuration is documented in
    docs/a1_parity_experiment.md (it does not sustain the reference's
    1.4 m/s command — a config value the reference never evidences)."""
    B = 1
    mpc = MpcParams(horizon=10)
    tile = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), t
    )
    robot1, cp = fullorder.a1_isaacgym_parity_config()
    robot = tile(robot1)
    gait = tile(Gaits.trotting10())
    cmd = tile(Command.trot_forward(1.2))
    (state, _), metrics = fullorder.rollout(
        robot, mpc, gait, cmd, num_ticks=1600, cp=cp, spec=mjcf.a1_spec(),
        cmd_ramp_ticks=500, substeps=4,
    )
    assert np.all(np.isfinite(np.asarray(state.pos)))
    assert np.all(np.isfinite(np.asarray(metrics["height"])))
    # (The substeps=1 NaN blowup that motivates this feature is chaotic in
    # its onset conditions — measured r4 at 1.2-1.3 m/s with a 1.5 s ramp —
    # so the positive finite-integration contract is what's pinned here;
    # the blowup grid lives in docs/a1_parity_experiment.md.)
