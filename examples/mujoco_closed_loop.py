#!/usr/bin/env python
"""Closed-loop Aliengo trot in MuJoCo 3 — the full-order behavioral oracle.

TPU-native equivalent of the reference's primary entry point
(ref ``scripts/mujoco_aliengo.py:157-240``), headless, driven by either:

- ``--controller oracle``  the float64 numpy golden controller, or
- ``--controller jax``     the float32 JAX engine (jitted, CPU or TPU).

It reproduces the reference setup: MJCF model, nominal stance reset
(q = (0, 0.8, -1.6) x 4 at the desired height, ref :32-39), ground-truth
state feed (ref :59-99), TROTTING10 at v_x = 1.2 m/s (ref :176-180).

Also used by ``tests/test_mujoco_e2e.py`` (shorter run) and to record golden
observation/GRF traces (``--record trace.npz``) for lockstep replays.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin force-appends itself to jax_platforms regardless of the
# JAX_PLATFORMS env var, and its client init can hang when the TPU tunnel is
# unreachable or other native libs (mujoco/scipy) load first.  When the user
# asked for CPU, pin it via jax.config BEFORE importing mujoco (same pattern
# as tests/conftest.py).
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")

# MuJoCo's bindings choose the GL backend at import time; pre-set EGL so the
# offscreen --render path works headless (harmless when not rendering).
os.environ.setdefault("MUJOCO_GL", "egl")

import mujoco
import numpy as np

# Self-contained: the MuJoCo model is GENERATED from the same RobotParams the
# controller uses (pympc_quadruped_tpu/env/mjcf.py) — no reference checkout
# needed.  Pass --xml to run against an external MJCF (e.g. the reference's
# robot/aliengo/aliengo.xml) instead.


def reset_nominal(model, data, height):
    mujoco.mj_resetData(model, data)
    data.qpos[:3] = [0.0, 0.0, height]
    data.qpos[3:7] = [1.0, 0.0, 0.0, 0.0]
    data.qpos[7:] = np.tile([0.0, 0.8, -1.6], 4)
    data.qvel[:] = 0.0
    mujoco.mj_forward(model, data)


def read_obs(model, data):
    """Ground-truth observation, matching the reference's feed (ref :59-99):
    world base pos/vel, sensor quaternion, body-frame gyro, joint pos/vel."""
    trunk = model.body("trunk").id
    vel6 = np.zeros(6)
    mujoco.mj_objectVelocity(model, data, mujoco.mjtObj.mjOBJ_BODY, trunk, vel6, 0)
    return {
        "pos": data.xpos[trunk].copy(),
        "vel": vel6[3:6].copy(),
        "quat": data.sensordata[0:4].copy(),
        "omega": data.sensordata[4:7].copy(),
        "q": data.sensordata[10:22].copy(),
        "qdot": data.sensordata[22:34].copy(),
    }


def read_raw_sensors(data):
    """IMU + encoders only — the reference's realistic input mode
    (ref ``get_simulated_sensor_data``, scripts/mujoco_aliengo.py:101-118):
    framequat, gyro, accelerometer, 12 jointpos, 12 jointvel."""
    return {
        "quat": data.sensordata[0:4].copy(),
        "gyro": data.sensordata[4:7].copy(),
        "accel": data.sensordata[7:10].copy(),
        "q": data.sensordata[10:22].copy(),
        "qdot": data.sensordata[22:34].copy(),
        "touch": data.sensordata[34:38].copy(),
    }


def make_kf_estimator(robot_name, init_pos):
    """Two-stage KF (estimation/kf.py) fed by raw sensors; returns a
    callable (raw, tick) -> controller observation dict.  Contact gating
    comes from the gait schedule's planned stance (TROTTING10), like the
    on-device estimated rollout."""
    import jax
    import jax.numpy as jnp
    from pympc_quadruped_tpu.estimation import kf
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import a1, aliengo
    from pympc_quadruped_tpu.ops import gaitsched, kin

    robot = aliengo() if robot_name == "aliengo" else a1()
    mpc = MpcParams(horizon=10)
    gait = Gaits.trotting10()
    # MuJoCo feet are spheres: the stance-foot *center* rests one radius
    # above ground (= -touchdown_z of the robot params).
    prm = kf.KfParams.default().replace(
        contact_height=-jnp.asarray(robot.touchdown_z)
    )
    q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4).reshape(4, 3)
    p_bf, _ = kin.leg_forward_kinematics(robot, q0)
    feet0 = jnp.asarray(init_pos, jnp.float32)[None, :] + p_bf
    state = {
        "kf": kf.KfState.init(jnp.asarray(init_pos, jnp.float32), feet0)
    }

    @jax.jit
    def _tick(st, gyro, accel, qj, qdj, contact):
        return kf.update(st, robot, gyro, accel, qj, qdj, contact, prm)

    def estimate(raw, tick):
        # Gate the foot-fixed measurements by MEASURED contact (the MJCF's
        # touch sensors), not the gait plan: a planned-stance foot that is
        # actually airborne (e.g. A1 straining for its unreachable 0.42 m
        # height target) would otherwise anchor velocity to a moving foot.
        contact = (np.asarray(raw["touch"]) > 0.5).astype(np.float32)
        st = _tick(
            state["kf"],
            jnp.asarray(raw["gyro"], jnp.float32),
            jnp.asarray(raw["accel"], jnp.float32),
            jnp.asarray(raw["q"], jnp.float32),
            jnp.asarray(raw["qdot"], jnp.float32),
            jnp.asarray(contact, jnp.float32),
        )
        state["kf"] = st
        return {
            "pos": np.asarray(st.x[0:3], np.float64),
            "vel": np.asarray(st.x[3:6], np.float64),
            "quat": np.asarray(st.quat, np.float64),
            "omega": raw["gyro"],
            "q": raw["q"],
            "qdot": raw["qdot"],
        }

    return estimate


def make_oracle_controller(horizon, robot_name="aliengo", vx=1.2, yaw_rate=0.0,
                           gait_name="trotting10"):
    from pympc_quadruped_tpu.oracle import npref

    params = (
        npref.oracle_aliengo() if robot_name == "aliengo" else npref.oracle_a1()
    )
    ctrl = npref.OracleController(
        params,
        npref.OracleConfig(horizon=horizon),
        npref.OracleGait.by_name(gait_name),
    )

    def step(obs, tick):
        out = ctrl.step(obs, [vx, 0.0, 0.0], yaw_rate, tick)
        return out["torques"], out["forces"]

    return step


def make_jax_controller(horizon, robot_name="aliengo", vx=1.2, yaw_rate=0.0,
                        gait_name="trotting10", gait_plan=None):
    import jax
    import jax.numpy as jnp
    from pympc_quadruped_tpu.models.command import Command
    from pympc_quadruped_tpu.models.gaits import Gaits
    from pympc_quadruped_tpu.models.mpc import MpcParams
    from pympc_quadruped_tpu.models.robots import a1, aliengo
    from pympc_quadruped_tpu.control import controller as ctl
    from pympc_quadruped_tpu.ops import kin

    mpc = MpcParams(horizon=horizon)
    tile = lambda t: jax.tree.map(lambda x: jnp.asarray(x)[None], t)
    params = aliengo() if robot_name == "aliengo" else a1()
    command = Command.trot_forward(vx).replace(yaw_turn_rate=jnp.float32(yaw_rate))
    robot, cmd = tile(params), tile(command)
    # ``gait_plan`` = [(gait_name, until_tick), ...]: LIVE gait switching.
    # Gait params are shape-uniform pytrees, so the gait is a traced
    # ARGUMENT of one jitted step — switching costs nothing (no recompile,
    # full controller state carries across, same contract as the chunked
    # rollout transitions in tests/test_gait_sweep.py).  The reference's
    # Gait object is fixed at construction (ref mujoco_aliengo.py:176).
    if gait_plan is None:
        gait_plan = [(gait_name, None)]
    plan_gaits = [tile(Gaits.by_name(g)) for g, _ in gait_plan]
    plan_until = [u for _, u in gait_plan]
    carry = tile(ctl.init_carry(mpc.horizon))
    step_fn = jax.jit(
        lambda g, c, o, t: ctl.step_batch(robot, mpc, g, cmd, c, o, t)
    )
    state = {"carry": carry}

    def gait_at(tick):
        for g, until in zip(plan_gaits, plan_until):
            if until is None or tick < until:
                return g
        return plan_gaits[-1]

    def step(obs, tick):
        o = kin.RobotObs(
            pos_base=jnp.asarray(obs["pos"], jnp.float32)[None],
            lin_vel_base=jnp.asarray(obs["vel"], jnp.float32)[None],
            quat_base=jnp.asarray(obs["quat"], jnp.float32)[None],
            ang_vel_base=jnp.asarray(obs["omega"], jnp.float32)[None],
            q=jnp.asarray(obs["q"], jnp.float32)[None],
            qdot=jnp.asarray(obs["qdot"], jnp.float32)[None],
        )
        state["carry"], out = step_fn(
            gait_at(tick), state["carry"], o, jnp.int32(tick)
        )
        return np.asarray(out.torques[0]), np.asarray(out.contact_forces[0])

    return step


def run(controller="oracle", seconds=5.0, horizon=10, record=None, verbose=True,
        robot="aliengo", vx=None, xml=None, sensors="truth", yaw_rate=0.0,
        render=None, render_fps=30, gait="trotting10", view=False,
        gait_plan=None, warmup_ticks=0):
    """``render``: path of an offscreen-rendered GIF of the run (the
    publishable artifact matching the reference's
    ``doc/results/trotting10_mujoco.gif``).  Uses ``mujoco.Renderer`` with a
    trunk-tracking camera; requires a headless GL backend (MUJOCO_GL=egl
    works in this image).

    ``view``: open a live interactive window via
    ``mujoco.viewer.launch_passive`` — the counterpart of the reference's
    MjViewer loop (ref ``scripts/mujoco_aliengo.py:162,228``).  Needs a
    display (GLFW); on the headless TPU hosts this image targets, prefer
    ``--render``."""
    from pympc_quadruped_tpu.env import mjcf

    if vx is None:
        # Reference commands: Aliengo trot at 1.2 (ref mujoco_aliengo.py:179),
        # A1 at 1.4 (ref isaacgym_a1.py:98).
        vx = 1.2 if robot == "aliengo" else 1.4
    if xml is not None:
        model = mujoco.MjModel.from_xml_path(xml)
    else:
        model = mujoco.MjModel.from_xml_string(mjcf.model_xml(robot))
    data = mujoco.MjData(model)
    height = 0.38 if robot == "aliengo" else 0.3
    reset_nominal(model, data, height)
    mujoco.mj_step(model, data)  # settle one step, like the reference (ref :167)

    if gait_plan is not None and controller != "jax":
        raise ValueError("--gait-plan needs --controller jax")
    if gait_plan is not None:
        # The flight-aware reference trajectory is exact only when the
        # horizon covers the gait period (refmpc._flight_rows docstring);
        # running e.g. jumping16 under the default --horizon 10 silently
        # truncates the stance table mid-flight-window (r4 advisor).
        from pympc_quadruped_tpu.models.gaits import Gaits

        import numpy as _np

        for name, _ in gait_plan:
            g = Gaits.by_name(name)
            segs = int(g.num_segments)
            # All-stance gaits (standing) truncate exactly — every table
            # slot is 1 regardless of horizon — so only phased gaits gate.
            all_stance = bool(
                _np.all(_np.asarray(g.stance_durations) >= segs)
            )
            if segs > horizon and not all_stance:
                raise ValueError(
                    f"--gait-plan gait '{name}' has {segs} segments but "
                    f"--horizon is {horizon}; the planned-gait table would "
                    f"be truncated (use --horizon {segs})"
                )
    step_fn = (
        make_oracle_controller(horizon, robot, vx, yaw_rate, gait)
        if controller == "oracle"
        else make_jax_controller(horizon, robot, vx, yaw_rate, gait,
                                 gait_plan=gait_plan)
    )
    estimator = None
    if sensors == "raw":
        estimator = make_kf_estimator(robot, data.xpos[model.body("trunk").id])

    n_ticks = int(seconds * 1000)
    log = {"t": [], "pos": [], "vel": [], "obs": [], "forces": [], "torques": []}
    renderer, frames, frame_every = None, [], max(1, 1000 // render_fps)
    if render is not None:
        renderer = mujoco.Renderer(model, 480, 640)
        cam = mujoco.MjvCamera()
        cam.type = mujoco.mjtCamera.mjCAMERA_TRACKING
        cam.trackbodyid = model.body("trunk").id
        cam.distance, cam.elevation, cam.azimuth = 1.6, -18.0, 120.0
    viewer = None
    if view:
        # Not a plain `import mujoco.viewer`: that would bind `mujoco` as a
        # function-local and shadow the module-level import everywhere above.
        from mujoco import viewer as mj_viewer

        # Passive viewer: the sim loop below stays in charge; we just sync
        # the window every tick (the reference renders every tick too,
        # ref mujoco_aliengo.py:228).
        viewer = mj_viewer.launch_passive(model, data)
    if warmup_ticks:
        # Standing warm-up before walking: a FRESH controller instance runs
        # the STANDING gait at zero command (the reference ships exactly
        # this as ``initialize_robot``, ref mujoco_aliengo.py:121-155 — 800
        # ticks of standing MPC with its own controller objects — but no
        # script ever calls it; here it is a first-class flag).
        warm_fn = (
            make_oracle_controller(horizon, robot, 0.0, 0.0, "standing")
            if controller == "oracle"
            else make_jax_controller(horizon, robot, 0.0, 0.0, "standing")
        )
        for tick in range(int(warmup_ticks)):
            obs = read_obs(model, data)
            torques, _ = warm_fn(obs, tick)
            data.ctrl[:] = torques
            mujoco.mj_step(model, data)
        if verbose:
            print(f"warm-up done ({warmup_ticks} standing ticks, "
                  f"height {data.qpos[2]:.3f})")
    t_start = time.time()
    for tick in range(n_ticks):
        if estimator is not None:
            obs = estimator(read_raw_sensors(data), tick)
            obs["true_pos"] = data.xpos[model.body("trunk").id].copy()
        else:
            obs = read_obs(model, data)
        torques, forces = step_fn(obs, tick)
        data.ctrl[:] = torques
        mujoco.mj_step(model, data)

        if record is not None:
            log["obs"].append(obs)
            log["forces"].append(forces.copy())
            log["torques"].append(np.asarray(torques).copy())
        if renderer is not None and tick % frame_every == 0:
            renderer.update_scene(data, camera=cam)
            frames.append(renderer.render().copy())
        if viewer is not None:
            if not viewer.is_running():
                if verbose:
                    print("viewer closed; stopping run")
                break
            viewer.sync()
        if tick % 1000 == 0 and verbose:
            print(
                f"t={tick/1000:.1f}s pos=({data.qpos[0]:+.2f},{data.qpos[1]:+.2f},"
                f"{data.qpos[2]:.3f}) vx={obs['vel'][0]:+.2f}"
            )
        log["t"].append(tick / 1000)
        log["pos"].append(data.qpos[:3].copy())
        log["vel"].append(obs["vel"].copy())
        if data.qpos[2] < 0.12:
            if verbose:
                print(f"FELL at t={tick/1000:.2f}s")
            break

    wall = time.time() - t_start
    if viewer is not None:
        viewer.close()
    if renderer is not None:
        from PIL import Image

        renderer.close()
        imgs = [Image.fromarray(f) for f in frames]
        if imgs:
            imgs[0].save(
                render, save_all=True, append_images=imgs[1:],
                duration=int(1000 / render_fps), loop=0,
            )
            if verbose:
                print(f"rendered {len(imgs)} frames -> {render}")
        elif verbose:
            print(f"no frames captured; skipping GIF write to {render}")
    pos = np.array(log["pos"])
    vel = np.array(log["vel"])
    n = len(pos)
    qw, qx, qy, qz = data.qpos[3:7]
    final_yaw = np.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
    result = {
        "completed": n == n_ticks,
        "final_x": float(pos[-1, 0]),
        "final_y": float(pos[-1, 1]),
        "final_yaw": float(final_yaw),
        "mean_vx_last_2s": float(vel[-2000:, 0].mean()) if n > 2000 else float(vel[:, 0].mean()),
        "mean_height_last_2s": float(pos[-2000:, 2].mean()) if n > 2000 else float(pos[:, 2].mean()),
        "wall_s": wall,
        "sim_s": n / 1000.0,
    }
    if verbose:
        print(result)
    if record is not None and n > 0:
        obs_arr = {
            k: np.stack([o[k] for o in log["obs"]]) for k in log["obs"][0]
        }
        np.savez_compressed(
            record,
            forces=np.stack(log["forces"]),
            torques=np.stack(log["torques"]),
            **{f"obs_{k}": v for k, v in obs_arr.items()},
        )
        if verbose:
            print(f"recorded {n} ticks -> {record}")
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--controller", choices=["oracle", "jax"], default="oracle")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--record", default=None)
    ap.add_argument("--robot", choices=["aliengo", "a1"], default="aliengo")
    ap.add_argument("--vx", type=float, default=None)
    ap.add_argument("--yaw-rate", type=float, default=0.0, dest="yaw_rate")
    ap.add_argument("--xml", default=None, help="external MJCF instead of generated")
    ap.add_argument(
        "--sensors", choices=["truth", "raw"], default="truth",
        help="raw = IMU+encoders through the two-stage KF (no ground truth)",
    )
    ap.add_argument("--render", default=None,
                    help="write an offscreen-rendered GIF of the run here")
    ap.add_argument("--gait-plan", default=None, dest="gait_plan",
                    help="live gait switching (jax controller): "
                         "'name:until_tick,name:until_tick,name' e.g. "
                         "'trotting16:1200,jumping16:2480,trotting16'")
    ap.add_argument("--view", action="store_true",
                    help="live interactive window (mujoco.viewer.launch_passive;"
                         " needs a display — use --render when headless)")
    ap.add_argument("--warmup-ticks", type=int, default=0, dest="warmup_ticks",
                    help="standing-MPC warm-up ticks before walking (the "
                         "reference's unused initialize_robot routine, ref "
                         "mujoco_aliengo.py:121-155, uses 800)")
    ap.add_argument("--gait", default="trotting10",
                    help="any library gait (ref mujoco_aliengo.py:176 could "
                         "run any gait too): trotting10/16, pacing10/16, "
                         "bounding8, jumping16, standing")
    args = ap.parse_args()
    plan = None
    if args.gait_plan:
        plan = []
        for part in args.gait_plan.split(","):
            name, _, until = part.partition(":")
            plan.append((name, int(until) if until else None))
    run(args.controller, args.seconds, args.horizon, args.record,
        robot=args.robot, vx=args.vx, xml=args.xml, sensors=args.sensors,
        yaw_rate=args.yaw_rate, render=args.render, gait=args.gait,
        view=args.view, gait_plan=plan, warmup_ticks=args.warmup_ticks)
