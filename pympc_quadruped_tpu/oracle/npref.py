"""Float64 numpy oracle for the reference controller semantics.

This is the framework's *golden model*: a from-scratch, vectorized numpy
implementation of the exact control law of ``yinghansun/pympc-quadruped``
(including its quirks — dt_predict=0.05 vs dt_gait=0.02, the +-0.1 m desired
position clamp write-back, the -0.0255 m touchdown height, the Pinocchio
world/body velocity-frame mixup in relative foot velocities, and the strict
``>`` swing-window comparisons).  The TPU engine is validated against it in
lockstep in ``tests/test_golden_lockstep.py``.

The QP oracle is a float64 predictor-corrector interior-point solve iterated
to KKT residuals ~1e-10 and *self-certifying*: :func:`solve_qp_kkt` returns
the residuals so tests can assert optimality independently of the algorithm.
Citations: structure per reference ``linear_mpc/mpc.py``; semantics table in
SURVEY.md §2.2.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------- rotations


def quat_to_rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (w * y + x * z)],
            [2 * (w * z + x * y), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (w * x + y * z), w * w - x * x - y * y + z * z],
        ]
    )


def quat_to_zyx(q):
    w, x, y, z = q
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return np.array([roll, pitch, yaw])


def rot_z(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def skew(v):
    return np.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )


# ---------------------------------------------------------------- parameters


@dataclass
class OracleRobot:
    mass: float
    inertia: np.ndarray
    base_height_des: float
    fz_max: float
    swing_height: float
    kp_swing: np.ndarray
    kd_swing: np.ndarray
    hip_offset: np.ndarray  # (4,3)
    hip_len: np.ndarray     # (4,) signed
    l_thigh: float
    l_calf: float
    touchdown_z: float = -0.0255


def oracle_aliengo() -> OracleRobot:
    inertia = np.array(
        [
            [0.033260231, -0.000451628, 0.000487603],
            [-0.000451628, 0.16117211, 4.8356e-05],
            [0.000487603, 4.8356e-05, 0.17460442],
        ]
    )
    hips = np.array(
        [
            [0.2399, 0.051, 0.0],
            [0.2399, -0.051, 0.0],
            [-0.2399, 0.051, 0.0],
            [-0.2399, -0.051, 0.0],
        ]
    )
    return OracleRobot(
        mass=9.042,
        inertia=inertia,
        base_height_des=0.38,
        fz_max=500.0,
        swing_height=0.1,
        kp_swing=np.full(3, 200.0),
        kd_swing=np.full(3, 20.0),
        hip_offset=hips,
        hip_len=np.array([0.083, -0.083, 0.083, -0.083]),
        l_thigh=0.25,
        l_calf=0.25,
    )


def oracle_a1() -> OracleRobot:
    inertia = (
        np.array(
            [
                [0.01683993, 8.3902e-05, 0.000597679],
                [8.3902e-05, 0.056579028, 2.5134e-05],
                [0.000597679, 2.5134e-05, 0.064713601],
            ]
        )
        * 10.0
    )
    hips = np.array(
        [
            [0.183, 0.047, 0.0],
            [0.183, -0.047, 0.0],
            [-0.183, 0.047, 0.0],
            [-0.183, -0.047, 0.0],
        ]
    )
    return OracleRobot(
        mass=4.713,
        inertia=inertia,
        base_height_des=0.42,
        fz_max=500.0,
        swing_height=0.1,
        kp_swing=np.full(3, 700.0),
        kd_swing=np.full(3, 20.0),
        hip_offset=hips,
        hip_len=np.array([0.08505, -0.08505, 0.08505, -0.08505]),
        l_thigh=0.2,
        l_calf=0.2,
    )


@dataclass
class OracleConfig:
    dt_control: float = 0.001
    iterations_between_mpc: int = 20
    dt_predict: float = 0.05
    horizon: int = 16
    gravity: float = 9.81
    mu: float = 0.7
    q_diag: np.ndarray = field(
        default_factory=lambda: np.array(
            [5.0, 5.0, 10.0, 10.0, 10.0, 50.0, 0.01, 0.01, 0.2, 0.2, 0.2, 0.2, 0.0]
        )
    )
    r_scalar: float = 1.0e-5

    @property
    def dt_gait(self):
        return self.dt_control * self.iterations_between_mpc


@dataclass
class OracleGait:
    num_segments: int
    stance_offsets: np.ndarray
    stance_durations: np.ndarray

    @staticmethod
    def trotting10():
        return OracleGait(10, np.array([0, 5, 5, 0]), np.array([5, 5, 5, 5]))

    @staticmethod
    def standing():
        return OracleGait(16, np.zeros(4, int), np.full(4, 16))

    @staticmethod
    def trotting16():
        return OracleGait(16, np.array([0, 8, 8, 0]), np.array([8, 8, 8, 8]))

    @staticmethod
    def pacing10():
        return OracleGait(10, np.array([5, 0, 5, 0]), np.array([5, 5, 5, 5]))

    @staticmethod
    def pacing16():
        return OracleGait(16, np.array([8, 0, 8, 0]), np.array([8, 8, 8, 8]))

    @staticmethod
    def jumping16():
        return OracleGait(16, np.zeros(4, int), np.full(4, 4))

    @staticmethod
    def bounding8():
        return OracleGait(8, np.array([4, 4, 0, 0]), np.array([4, 4, 4, 4]))

    @staticmethod
    def by_name(name: str) -> "OracleGait":
        """Same library as the JAX side (ref linear_mpc/gait.py:16-22)."""
        return {
            "standing": OracleGait.standing,
            "trotting10": OracleGait.trotting10,
            "trotting16": OracleGait.trotting16,
            "pacing10": OracleGait.pacing10,
            "pacing16": OracleGait.pacing16,
            "jumping16": OracleGait.jumping16,
            "bounding8": OracleGait.bounding8,
        }[name]()


# ---------------------------------------------------------------- kinematics


def leg_fk(robot: OracleRobot, q_legs):
    """(4,3) joint angles -> (4,3) base-frame foot positions, (4,3,3) Jacobians."""
    q1, q2, q3 = q_legs[:, 0], q_legs[:, 1], q_legs[:, 2]
    s_hip, l2, l3 = robot.hip_len, robot.l_thigh, robot.l_calf
    c1, s1 = np.cos(q1), np.sin(q1)
    c2, s2 = np.cos(q2), np.sin(q2)
    c23, s23 = np.cos(q2 + q3), np.sin(q2 + q3)
    u = -l2 * s2 - l3 * s23
    w = -l2 * c2 - l3 * c23
    p = robot.hip_offset + np.stack(
        [u, c1 * s_hip - s1 * w, s1 * s_hip + c1 * w], axis=-1
    )
    zero = np.zeros_like(q1)
    col1 = np.stack([zero, -s1 * s_hip - c1 * w, c1 * s_hip - s1 * w], axis=-1)
    col2 = np.stack([w, s1 * u, -c1 * u], axis=-1)
    col3 = np.stack([-l3 * c23, -s1 * l3 * s23, c1 * l3 * s23], axis=-1)
    J = np.stack([col1, col2, col3], axis=-1)
    return p, J


def thigh_pos(robot: OracleRobot, q_legs):
    q1 = q_legs[:, 0]
    return robot.hip_offset + np.stack(
        [np.zeros_like(q1), np.cos(q1) * robot.hip_len, np.sin(q1) * robot.hip_len],
        axis=-1,
    )


@dataclass
class OracleKin:
    R: np.ndarray
    rpy: np.ndarray
    pos_base: np.ndarray
    vel_base: np.ndarray
    omega_body: np.ndarray
    p_bf: np.ndarray         # (4,3) base frame
    pos_feet: np.ndarray     # (4,3) world
    pos_base_feet: np.ndarray
    vel_rel_base: np.ndarray
    thighs: np.ndarray
    J: np.ndarray            # (4,3,3)


def kin_update(robot: OracleRobot, obs: dict, vel_quirk: bool = True) -> OracleKin:
    R = quat_to_rotmat(np.asarray(obs["quat"], float))
    rpy = quat_to_zyx(np.asarray(obs["quat"], float))
    pos = np.asarray(obs["pos"], float)
    vel = np.asarray(obs["vel"], float)
    omega = np.asarray(obs["omega"], float)
    q_legs = np.asarray(obs["q"], float).reshape(4, 3)
    qd_legs = np.asarray(obs["qdot"], float).reshape(4, 3)

    p_bf, J = leg_fk(robot, q_legs)
    pos_base_feet = p_bf @ R.T
    rel = np.cross(np.broadcast_to(omega, (4, 3)), p_bf) + np.einsum(
        "lij,lj->li", J, qd_legs
    )
    if vel_quirk:
        rel = rel + (vel - R.T @ vel)[None, :]
    return OracleKin(
        R=R,
        rpy=rpy,
        pos_base=pos,
        vel_base=vel,
        omega_body=omega,
        p_bf=p_bf,
        pos_feet=pos + pos_base_feet,
        pos_base_feet=pos_base_feet,
        vel_rel_base=rel,
        thighs=thigh_pos(robot, q_legs),
        J=J,
    )


# ---------------------------------------------------------------- gait


def gait_phase(gait: OracleGait, cfg: OracleConfig, tick: int):
    it = (tick // cfg.iterations_between_mpc) % gait.num_segments
    period = cfg.iterations_between_mpc * gait.num_segments
    return it, (tick % period) / period


def gait_table(gait: OracleGait, cfg: OracleConfig, tick: int):
    it, _ = gait_phase(gait, cfg, tick)
    steps = np.arange(cfg.horizon)
    seg = (steps + 1 + it) % gait.num_segments
    cur = seg[:, None] - gait.stance_offsets[None, :]
    cur = np.where(cur < 0, cur + gait.num_segments, cur)
    return (cur < gait.stance_durations[None, :]).astype(float).reshape(-1)


def _window(phase, off, dur):
    st = phase - off
    st = np.where(st < 0, st + 1.0, st)
    # dur == 0 (STANDING's zero swing duration) must yield 0, not a 0/0
    # RuntimeWarning — keep the oracle warning-clean so real NaN regressions
    # stand out.
    safe_dur = np.where(dur > 0, dur, 1.0)
    return np.where((st > dur) | (dur <= 0), 0.0, st / safe_dur)


def swing_state(gait: OracleGait, cfg: OracleConfig, tick: int):
    _, phase = gait_phase(gait, cfg, tick)
    off = (gait.stance_offsets + gait.stance_durations) / gait.num_segments
    off = np.where(off > 1.0, off - 1.0, off)
    dur = 1.0 - gait.stance_durations / gait.num_segments
    return _window(phase, off, dur)


def swing_time(gait: OracleGait, cfg: OracleConfig):
    return cfg.dt_gait * (gait.num_segments - gait.stance_durations[0])


def stance_time(gait: OracleGait, cfg: OracleConfig):
    return cfg.dt_gait * gait.stance_durations[0]


# ---------------------------------------------------------------- QP oracle


def solve_qp_kkt(H, g, mu, fz_max, gait_tbl, tol=1e-10, max_iter=60):
    """Solve the condensed MPC QP to high accuracy, float64.

    Same mathematical problem as the reference solve (ref mpc.py:262-290):
    swing-leg forces pinned to zero (their implied constraints are
    0 <= fz <= 0 and |fx|,|fy| <= 0), stance feet in the friction pyramid.

    Returns (U, kkt) where kkt = (stationarity, primal, complementarity)
    max-residuals for self-certification.
    """
    n = g.shape[0]
    h_steps = n // 12
    stance = gait_tbl.reshape(h_steps, 4)
    mv = np.repeat(gait_tbl, 3)

    Hm = H * np.outer(mv, mv) + np.diag(1.0 - mv)
    gm = g * mv

    rows = np.array(
        [
            [-1, 0, -mu],
            [1, 0, -mu],
            [0, -1, -mu],
            [0, 1, -mu],
            [0, 0, -1],
            [0, 0, 1],
        ],
        dtype=float,
    )
    # Dense constraint matrix over stance blocks only.
    G_blocks = rows[None, None] * stance[:, :, None, None]  # (h,4,6,3)
    m = h_steps * 4 * 6
    G = np.zeros((m, n))
    h_vec = np.zeros(m)
    r = 0
    for i in range(h_steps):
        for l in range(4):
            G[r : r + 6, 12 * i + 3 * l : 12 * i + 3 * l + 3] = G_blocks[i, l]
            h_vec[r : r + 6] = (
                [0, 0, 0, 0, 0, fz_max] if stance[i, l] > 0 else [1] * 6
            )
            r += 6

    x = np.zeros(n)
    s = np.maximum(h_vec, 1.0)
    lam = np.ones(m)

    def kkt_residuals(x, s, lam):
        r_d = Hm @ x + gm + G.T @ lam
        r_p = G @ x + s - h_vec
        return (
            np.max(np.abs(r_d)),
            np.max(np.abs(r_p)),
            np.max(np.abs(s * lam)),
        )

    for _ in range(max_iter):
        r_d = Hm @ x + gm + G.T @ lam
        r_p = G @ x + s - h_vec
        mu_gap = s @ lam / m
        if max(kkt_residuals(x, s, lam)) < tol:
            break
        d = lam / s
        M = Hm + G.T @ (d[:, None] * G) + 1e-13 * np.eye(n)
        L = np.linalg.cholesky(M)

        def solve_kkt(r_c):
            rhs = -r_d - G.T @ ((lam * r_p - r_c) / s)
            dx = np.linalg.solve(L.T, np.linalg.solve(L, rhs))
            ds = -r_p - G @ dx
            dlam = (-r_c - lam * ds) / s
            return dx, ds, dlam

        dx_a, ds_a, dlam_a = solve_kkt(s * lam)

        def max_step(z, dz):
            neg = dz < 0
            return min(1.0, np.min(-z[neg] / dz[neg])) if np.any(neg) else 1.0

        a_aff = min(max_step(s, ds_a), max_step(lam, dlam_a))
        mu_aff = (s + a_aff * ds_a) @ (lam + a_aff * dlam_a) / m
        sigma = (mu_aff / max(mu_gap, 1e-16)) ** 3
        dx, ds, dlam = solve_kkt(s * lam + ds_a * dlam_a - sigma * mu_gap)
        a = 0.99 * min(max_step(s, ds), max_step(lam, dlam))
        a = min(a, 1.0)
        x, s, lam = x + a * dx, np.maximum(s + a * ds, 1e-300), np.maximum(
            lam + a * dlam, 1e-300
        )

    return x * mv, kkt_residuals(x, s, lam)


# ---------------------------------------------------------------- controller


class OracleController:
    """Stateful float64 controller with reference-identical semantics.

    One instance drives one robot; the MuJoCo harness and the lockstep tests
    both use it.  State layout mirrors SURVEY.md §2.2's carry inventory.
    """

    def __init__(self, robot: OracleRobot, cfg: OracleConfig, gait: OracleGait):
        self.robot = robot
        self.cfg = cfg
        self.gait = gait
        # MPC carry
        self.forces = np.zeros(12)
        self.xpos_des = 0.0
        self.ypos_des = 0.0
        self.yaw_des = 0.0
        self.roll_int = 0.0
        self.pitch_int = 0.0
        self.first_run = True
        # swing carry
        self.is_first_swing = np.ones(4, bool)
        self.remaining = np.zeros(4)
        self.foot_init = np.zeros((4, 3))
        self.foot_final = np.zeros((4, 3))
        # debug
        self.last_kkt = None

    # --- MPC internals -------------------------------------------------

    def _reference_traj(self, x_t, vel_des_world, yaw_rate):
        cfg, robot = self.cfg, self.robot
        dt = cfg.dt_predict
        self.xpos_des = np.clip(self.xpos_des, x_t[3] - 0.1, x_t[3] + 0.1)
        self.ypos_des = np.clip(self.ypos_des, x_t[4] - 0.1, x_t[4] + 0.1)
        if abs(x_t[9]) > 0.2:
            self.pitch_int += dt * (0.0 - x_t[1]) / x_t[9]
        if abs(x_t[10]) > 0.1:
            self.roll_int += dt * (0.0 - x_t[0]) / x_t[10]
        self.pitch_int = np.clip(self.pitch_int, -0.25, 0.25)
        self.roll_int = np.clip(self.roll_int, -0.25, 0.25)

        steps = np.arange(cfg.horizon)
        X = np.zeros((cfg.horizon, 13))
        X[:, 0] = x_t[10] * self.roll_int
        X[:, 1] = x_t[9] * self.pitch_int
        X[:, 2] = self.yaw_des + dt * yaw_rate * steps
        X[:, 3] = self.xpos_des + dt * vel_des_world[0] * steps
        X[:, 4] = self.ypos_des + dt * vel_des_world[1] * steps
        X[:, 5] = robot.base_height_des
        X[:, 8] = yaw_rate
        X[:, 9] = vel_des_world[0]
        X[:, 10] = vel_des_world[1]
        X[:, 12] = -cfg.gravity
        return X.reshape(-1)

    def _condensed_qp(self, x_t, yaw, r_feet, X_ref):
        cfg, robot = self.cfg, self.robot
        h = cfg.horizon
        Rz = rot_z(yaw)
        inv_I = np.linalg.inv(Rz @ robot.inertia @ Rz.T)
        Ac = np.zeros((13, 13))
        Ac[0:3, 6:9] = Rz.T
        Ac[3:6, 9:12] = np.eye(3)
        Ac[11, 12] = 1.0
        Bc = np.zeros((13, 12))
        for l in range(4):
            Bc[6:9, 3 * l : 3 * l + 3] = inv_I @ skew(r_feet[l])
            Bc[9:12, 3 * l : 3 * l + 3] = np.eye(3) / robot.mass
        dt = cfg.dt_predict
        A2 = Ac @ Ac
        Ad = np.eye(13) + Ac * dt + A2 * (dt * dt / 2)
        Bd = (np.eye(13) * dt + Ac * (dt * dt / 2) + A2 * (dt**3 / 6)) @ Bc

        pows = [np.eye(13)]
        for _ in range(h):
            pows.append(pows[-1] @ Ad)
        Sx = np.concatenate(pows[1 : h + 1], axis=0)
        Su = np.zeros((13 * h, 12 * h))
        M = [pows[k] @ Bd for k in range(h)]
        for i in range(h):
            for j in range(i + 1):
                Su[13 * i : 13 * i + 13, 12 * j : 12 * j + 12] = M[i - j]
        q_bar = np.tile(cfg.q_diag, h)
        H = 2.0 * (Su.T @ (q_bar[:, None] * Su) + cfg.r_scalar * np.eye(12 * h))
        g = 2.0 * (Su.T @ (q_bar * (Sx @ x_t - X_ref)))
        return H, g

    def _mpc_update(self, kin: OracleKin, vel_cmd_base, yaw_rate, tick, table):
        cfg = self.cfg
        vel_des_world = kin.R @ np.asarray(vel_cmd_base, float)
        if self.first_run:
            self.xpos_des = 0.0
            self.ypos_des = 0.0
            self.yaw_des = kin.rpy[2]
            self.first_run = False
        else:
            self.xpos_des += cfg.dt_control * vel_des_world[0]
            self.ypos_des += cfg.dt_control * vel_des_world[1]
            self.yaw_des = kin.rpy[2] + cfg.dt_control * yaw_rate

        if tick % cfg.iterations_between_mpc == 0:
            x_t = np.concatenate(
                [kin.rpy, kin.pos_base, kin.omega_body, kin.vel_base, [-cfg.gravity]]
            )
            X_ref = self._reference_traj(x_t, vel_des_world, yaw_rate)
            H, g = self._condensed_qp(x_t, kin.rpy[2], kin.pos_base_feet, X_ref)
            # Degrade gracefully on a failed solve (indefinite H from a wild
            # estimated state, non-finite data): hold the previous GRFs —
            # the engine-side fallback and the reference's implicit behavior
            # (last solution stays applied, ref linear_mpc/mpc.py:99,108).
            try:
                U, kkt = solve_qp_kkt(
                    H, g, cfg.mu, self.robot.fz_max, table
                )
                if np.all(np.isfinite(U)):
                    self.last_kkt = kkt
                    self.forces = U[:12]
            except np.linalg.LinAlgError:
                pass
        return self.forces

    # --- swing internals ----------------------------------------------

    def _swing_targets(self, kin: OracleKin, states, vel_cmd_base, yaw_rate):
        cfg, robot, gait = self.cfg, self.robot, self.gait
        t_sw = swing_time(gait, cfg)
        t_st = stance_time(gait, cfg)
        pos_t = np.zeros((4, 3))
        vel_t = np.zeros((4, 3))
        vel_des_world = kin.R @ np.asarray(vel_cmd_base, float)

        for leg in range(4):
            if states[leg] <= 0:
                continue
            if self.is_first_swing[leg]:
                self.remaining[leg] = t_sw
            else:
                self.remaining[leg] -= cfg.dt_control

            rotz = rot_z(yaw_rate * 0.5 * t_st)
            thigh_c = rotz @ kin.thighs[leg]
            final = (
                kin.pos_base
                + kin.R @ (thigh_c + np.asarray(vel_cmd_base, float) * self.remaining[leg])
                + 0.5 * t_st * kin.vel_base
                + 0.03 * (kin.vel_base - vel_des_world)
            )
            coef = 0.5 * kin.pos_base[2] / cfg.gravity
            final[0] += coef * kin.vel_base[1] * yaw_rate
            final[1] += coef * (-kin.vel_base[0] * yaw_rate)
            final[2] = robot.touchdown_z
            self.foot_final[leg] = final
            if self.is_first_swing[leg]:
                self.is_first_swing[leg] = False
                self.foot_init[leg] = kin.pos_feet[leg]
            if states[leg] >= 1.0:
                self.is_first_swing[leg] = True

            # Two-segment cubic Hermite with zero knot velocities.
            t = t_sw - self.remaining[leg]
            half = t_sw / 2
            mid = 0.5 * (self.foot_init[leg] + self.foot_final[leg])
            mid[2] = robot.swing_height
            if t < half:
                p0, p1, s = self.foot_init[leg], mid, t
            else:
                p0, p1, s = mid, self.foot_final[leg], t - half
            u = np.clip(s / half, 0.0, 1.0)
            pos_w = p0 + (3 * u * u - 2 * u**3) * (p1 - p0)
            vel_w = (6 * u - 6 * u * u) / half * (p1 - p0)

            pos_t[leg] = kin.R.T @ (pos_w - kin.pos_base)
            vel_t[leg] = kin.R.T @ (vel_w - kin.vel_base)
        return pos_t, vel_t

    def _torques(self, kin: OracleKin, states, pos_t, vel_t):
        robot = self.robot
        tau = np.zeros(12)
        for leg in range(4):
            if states[leg] != 0:
                f_w = robot.kp_swing * (
                    kin.R @ pos_t[leg] - kin.R @ kin.p_bf[leg]
                ) + robot.kd_swing * (kin.R @ vel_t[leg] - kin.R @ kin.vel_rel_base[leg])
            else:
                f_w = -self.forces[3 * leg : 3 * leg + 3]
            tau[3 * leg : 3 * leg + 3] = kin.J[leg].T @ (kin.R.T @ f_w)
        return tau

    # --- public tick ---------------------------------------------------

    def step(self, obs: dict, vel_cmd_base, yaw_rate, tick: int):
        """One 1 kHz tick.  Returns dict with torques/forces/targets."""
        kin = kin_update(self.robot, obs)
        states = swing_state(self.gait, self.cfg, tick)
        table = gait_table(self.gait, self.cfg, tick)
        forces = self._mpc_update(kin, vel_cmd_base, yaw_rate, tick, table)
        pos_t, vel_t = self._swing_targets(kin, states, vel_cmd_base, yaw_rate)
        tau = self._torques(kin, states, pos_t, vel_t)
        return {
            "torques": tau,
            "forces": forces.copy(),
            "swing_states": states,
            "pos_targets": pos_t,
            "vel_targets": vel_t,
            "kin": kin,
        }
