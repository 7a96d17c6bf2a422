"""Visualization — the framework's analog of the reference's viewers/plots.

The reference's only published result is a trot GIF rendered by the MuJoCo
viewer (ref ``doc/results/trotting10_mujoco.gif``, viewer at
``scripts/mujoco_aliengo.py:162,228``) plus a matplotlib debug plot of the
predicted CoM trajectory (ref ``linear_mpc/mpc.py:293-318``).  This module
provides headless (Agg) equivalents that work on a display-less TPU host —
no OpenGL needed:

- :func:`plot_predicted_com` — the reference's debug plot: the condensed
  prediction ``X = Sx x_t + Su U`` against the reference trajectory;
- :func:`plot_rollout_metrics` — batched closed-loop sweep curves
  (height, velocity tracking, divergence count over time);
- :func:`gait_diagram` — per-leg stance/swing bars over time;
- :func:`animate_trot` — a side/top-view stick-figure GIF of a recorded
  trot trace (trunk + FK legs), the publishable artifact equivalent.

All functions save to a path and return it; nothing requires a display.
"""
from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib import animation  # noqa: E402

from pympc_quadruped_tpu.models.mpc import NUM_STATE, MpcParams  # noqa: E402
from pympc_quadruped_tpu.models.robots import LEG_NAMES, RobotParams  # noqa: E402


def plot_predicted_com(
    robot: RobotParams,
    mpc: MpcParams,
    x_t,
    yaw,
    pos_base_feet,
    X_ref,
    U,
    path: str,
) -> str:
    """Predicted CoM trajectory from the condensed model vs the reference
    (ref ``mpc.py:293-318``): X = Sx x_t + Su U over the horizon."""
    import jax.numpy as jnp
    from pympc_quadruped_tpu.ops import condense, srb

    Ac, Bc = srb.state_space(robot, jnp.asarray(yaw), jnp.asarray(pos_base_feet))
    Ad, Bd = srb.discretize(Ac, Bc, mpc.dt_predict)
    Sx, Su = condense.rollout_matrices(Ad, Bd, mpc.horizon)
    X = np.asarray(Sx @ jnp.asarray(x_t) + Su @ jnp.asarray(U)).reshape(
        mpc.horizon, NUM_STATE
    )
    Xr = np.asarray(X_ref).reshape(mpc.horizon, NUM_STATE)

    fig, axes = plt.subplots(2, 3, figsize=(11, 6), sharex=True)
    steps = np.arange(mpc.horizon)
    labels = [("x", 3), ("y", 4), ("z", 5), ("roll", 0), ("pitch", 1), ("yaw", 2)]
    for ax, (name, idx) in zip(axes.flat, labels):
        ax.plot(steps, X[:, idx], "o-", label="predicted", ms=3)
        ax.plot(steps, Xr[:, idx], "s--", label="reference", ms=3)
        ax.set_title(name)
        ax.grid(alpha=0.3)
    axes[0, 0].legend(loc="best", fontsize=8)
    fig.suptitle("Condensed-model CoM prediction vs reference trajectory")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_rollout_metrics(metrics: dict, path: str, dt: float = 0.001) -> str:
    """Curves from ``srb_env.rollout`` metrics: per-tick (T, B) arrays."""
    h = np.asarray(metrics["height"])
    v = np.asarray(metrics["vel_err"])
    d = np.asarray(metrics["diverged"])
    t = np.arange(h.shape[0]) * dt

    fig, axes = plt.subplots(3, 1, figsize=(9, 7), sharex=True)
    for arr, ax, name in ((h, axes[0], "base height [m]"), (v, axes[1], "|v - v_des| [m/s]")):
        mean = arr.mean(axis=1)
        lo, hi = arr.min(axis=1), arr.max(axis=1)
        ax.plot(t, mean, lw=1.2, label="batch mean")
        ax.fill_between(t, lo, hi, alpha=0.25, label="batch min..max")
        ax.set_ylabel(name)
        ax.grid(alpha=0.3)
    axes[0].legend(fontsize=8)
    axes[2].plot(t, d.sum(axis=1), lw=1.0, color="tab:red")
    axes[2].set_ylabel("# diverged")
    axes[2].set_xlabel("time [s]")
    axes[2].grid(alpha=0.3)
    if "est_pos_err" in metrics:
        axes[1].plot(
            t, np.asarray(metrics["est_pos_err"]).mean(axis=1),
            lw=1.0, ls="--", label="KF pos err",
        )
        axes[1].legend(fontsize=8)
    fig.suptitle("Closed-loop sweep metrics")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def gait_diagram(gait, mpc: MpcParams, num_ticks: int, path: str) -> str:
    """Stance (filled) / swing (empty) bars per leg over time."""
    import jax
    import jax.numpy as jnp
    from pympc_quadruped_tpu.ops import gaitsched

    ticks = jnp.arange(num_ticks, dtype=jnp.int32)
    swing = np.asarray(
        jax.vmap(lambda t: gaitsched.swing_state(gait, mpc, t))(ticks)
    )  # (T, 4); 0 = stance
    stance = swing == 0.0
    t = np.arange(num_ticks) * float(mpc.dt_control)

    fig, ax = plt.subplots(figsize=(9, 2.4))
    for leg in range(4):
        on = stance[:, leg]
        # Segment boundaries.
        edges = np.flatnonzero(np.diff(on.astype(np.int8))) + 1
        bounds = np.concatenate([[0], edges, [num_ticks]])
        for a, b in zip(bounds[:-1], bounds[1:]):
            if on[a]:
                ax.barh(leg, t[b - 1] - t[a], left=t[a], height=0.6,
                        color="tab:blue", alpha=0.85)
    ax.set_yticks(range(4), LEG_NAMES)
    ax.set_xlabel("time [s]")
    ax.set_title("Gait diagram (filled = stance)")
    ax.grid(alpha=0.3, axis="x")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def animate_trot(
    trace: dict,
    robot: RobotParams,
    path: str,
    fps: int = 25,
    stride: int = 40,
) -> str:
    """Side-view stick-figure animation of a recorded trot -> GIF.

    ``trace`` holds per-tick arrays: ``obs_pos`` (T,3), ``obs_quat`` (T,4),
    ``obs_q`` (T,12) — the layout ``examples/mujoco_closed_loop.py --record``
    writes.  Trunk and FK'd legs are drawn in the world x-z plane; this is
    the headless equivalent of the reference's published viewer GIF.
    """
    import jax
    import jax.numpy as jnp
    from pympc_quadruped_tpu.ops import kin, lie

    pos = np.asarray(trace["obs_pos"])[::stride]
    quat = np.asarray(trace["obs_quat"])[::stride]
    q = np.asarray(trace["obs_q"])[::stride]
    T = pos.shape[0]

    R_all = np.asarray(jax.vmap(lie.quat_to_rotmat)(jnp.asarray(quat, jnp.float32)))
    p_bf, _ = jax.vmap(lambda qq: kin.leg_forward_kinematics(robot, qq.reshape(4, 3)))(
        jnp.asarray(q, jnp.float32)
    )
    feet_w = pos[:, None, :] + np.einsum("tij,tlj->tli", R_all, np.asarray(p_bf))
    hips_w = pos[:, None, :] + np.einsum(
        "tij,lj->tli", R_all, np.asarray(robot.hip_offset)
    )
    # Knee = hip + half thigh toward foot (visual approximation).
    half = float(np.asarray(robot.hip_offset)[0, 0])

    fig, ax = plt.subplots(figsize=(7, 3))
    ax.set_ylim(-0.02, 0.7)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_title("trot (stick view)")
    ax.axhline(0.0, color="k", lw=1)
    trunk_line, = ax.plot([], [], lw=5, color="tab:gray")
    leg_lines = [ax.plot([], [], lw=2, color=c)[0]
                 for c in ("tab:blue", "tab:orange", "tab:green", "tab:red")]
    foot_dots, = ax.plot([], [], "ko", ms=4)

    def frame(i):
        c = pos[i]
        fore = c + R_all[i] @ np.array([half, 0.0, 0.0])
        aft = c + R_all[i] @ np.array([-half, 0.0, 0.0])
        trunk_line.set_data([aft[0], fore[0]], [aft[2], fore[2]])
        for leg in range(4):
            hp, fp = hips_w[i, leg], feet_w[i, leg]
            leg_lines[leg].set_data([hp[0], fp[0]], [hp[2], fp[2]])
        foot_dots.set_data(feet_w[i, :, 0], feet_w[i, :, 2])
        ax.set_xlim(c[0] - 0.8, c[0] + 0.8)
        return [trunk_line, *leg_lines, foot_dots]

    anim = animation.FuncAnimation(fig, frame, frames=T, blit=False)
    anim.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path
