"""MPC hyper-parameters.

Mirrors the reference's ``LinearMpcConfig`` (reference
``config/linear_mpc_configs.py:4-24``) plus the reference's hard-coded
prediction step: the reference overrides its own config with ``dt = 0.05``
inside the controller even though ``dt_control * iterations_between_mpc =
0.02`` (ref ``linear_mpc/mpc.py:38``).  That 0.05 is what produced the
published trot, so it is the default here — kept as an explicit field
(``dt_predict``) instead of a buried constant.

``horizon`` and ``iterations_between_mpc`` are static (they set array shapes
and solve cadence); everything else is a traced array and can carry a batch
axis for randomization sweeps.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

NUM_STATE = 13   # [roll, pitch, yaw, x, y, z, wx, wy, wz, vx, vy, vz, g]
NUM_INPUT = 12   # [f_FL, f_FR, f_RL, f_RR], world frame


@struct.dataclass
class MpcParams:
    # --- static (shape-determining) ---
    horizon: int = struct.field(pytree_node=False, default=16)
    iterations_between_mpc: int = struct.field(pytree_node=False, default=20)
    # Terrain-adaptive height mode (static: selects a different reference /
    # swing program).  Off (default) reproduces the reference exactly: the
    # height row of X_ref, the swing apex and the touchdown target are
    # ABSOLUTE world heights (ref ``linear_mpc/mpc.py:160``,
    # ``swing_foot_trajectory_generator.py:120`` — a flat-world assumption
    # that walks off a 2 m staircase).  On, the controller estimates the
    # local ground plane from stance-foot leg odometry every solve tick
    # (no terrain oracle: the measurement a real robot has) and references
    # height/swing targets to it — the capability the reference's dead
    # PCA terrain-normal code intended (ref ``utils/robot_data.py:194-228``,
    # never called).  See control/refmpc.py + control/swing.py.
    ground_adaptive_height: bool = struct.field(pytree_node=False, default=False)
    # --- traced ---
    dt_control: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.001))
    dt_predict: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.05))
    gravity: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(9.81))
    friction_coef: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.7))
    # State weights, diag(Q) (ref linear_mpc_configs.py:19); input weight is
    # a uniform 1e-5 on all 12 force components (ref :20).
    q_diag: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array(
            [5.0, 5.0, 10.0, 10.0, 10.0, 50.0, 0.01, 0.01, 0.2, 0.2, 0.2, 0.2, 0.0],
            dtype=jnp.float32,
        )
    )
    r_diag: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.full((NUM_INPUT,), 1.0e-5, dtype=jnp.float32)
    )
    # Reference-trajectory shaping constants (ref mpc.py:121,143-150).
    max_pos_error: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))
    comp_saturation: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.25))

    @property
    def dt_gait(self):
        """Seconds per gait segment — what swing/stance times are measured in.

        NOTE: this is dt_control * iterations_between_mpc = 0.02 s, which the
        reference uses for gait timing (ref gait.py:70-74) while predicting
        with dt_predict = 0.05 s.  Both quirks are reproduced intentionally.
        """
        return self.dt_control * self.iterations_between_mpc


def default_mpc_params(horizon: int = 16) -> MpcParams:
    return MpcParams(horizon=horizon)
