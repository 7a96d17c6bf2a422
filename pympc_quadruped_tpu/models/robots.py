"""Robot parameter pytrees.

Physical parameters mirror the reference configs (reference
``config/robot_configs.py:21-56``) and the leg geometry is extracted from the
reference URDFs (``robot/aliengo/urdf/aliengo.urdf:98-200`` per-leg joint
origins, ``robot/a1/urdf/a1.urdf:89-188``), so the closed-form kinematics in
:mod:`pympc_quadruped_tpu.ops.kin` reproduces the reference's Pinocchio
floating-base FK without any rigid-body-dynamics library.

Every field is a JAX array so a batch of randomized robots is just this
dataclass with a leading batch axis (``jax.vmap`` over it works out of the
box) — mass/inertia domain randomization is a batch dimension, per
SURVEY.md §5.6.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# Leg order contract: FL, FR, RL, RR (see package docstring).
LEG_NAMES = ("FL", "FR", "RL", "RR")
NUM_LEGS = 4
NUM_JOINTS = 12


def _inertia_from_urdf(ixx, ixy, ixz, iyy, iyz, izz):
    """Symmetric 3x3 inertia from the 6 URDF scalars (ref utils/dynamics.py:3-18)."""
    return jnp.array(
        [
            [ixx, ixy, ixz],
            [ixy, iyy, iyz],
            [ixz, iyz, izz],
        ],
        dtype=jnp.float32,
    )


@struct.dataclass
class RobotParams:
    """Physical + leg-geometry parameters for one quadruped.

    Attributes
    ----------
    mass:          trunk mass [kg] (ref robot_configs.py:22).
    inertia:       (3,3) trunk rotational inertia in the base frame.
    base_height_des: desired standing CoM height [m].
    fz_max:        per-foot maximum vertical GRF for the MPC bound.
    swing_height:  apex height of the swing-foot spline [m].
    kp_swing/kd_swing: (3,) diagonal Cartesian PD gains for swing legs.
    hip_offset:    (4,3) hip (abduction) joint origin in the base frame.
    hip_len:       (4,) signed abduction link length along +y of the hip
                   frame (positive for left legs, negative for right legs).
    l_thigh/l_calf: thigh and calf link lengths [m].
    touchdown_z:   world-frame z used for planned footholds.  The reference
                   hard-codes -0.0255 m (ref swing_foot_trajectory_generator.py:120);
                   kept as a named parameter here.
    """

    mass: jnp.ndarray
    inertia: jnp.ndarray
    base_height_des: jnp.ndarray
    fz_max: jnp.ndarray
    swing_height: jnp.ndarray
    kp_swing: jnp.ndarray
    kd_swing: jnp.ndarray
    hip_offset: jnp.ndarray
    hip_len: jnp.ndarray
    l_thigh: jnp.ndarray
    l_calf: jnp.ndarray
    touchdown_z: jnp.ndarray


def _leg_layout(front_x: float, side_y: float, hip_len: float):
    """(4,3) hip origins + (4,) signed abduction lengths in FL,FR,RL,RR order."""
    hips = jnp.array(
        [
            [front_x, side_y, 0.0],   # FL
            [front_x, -side_y, 0.0],  # FR
            [-front_x, side_y, 0.0],  # RL
            [-front_x, -side_y, 0.0], # RR
        ],
        dtype=jnp.float32,
    )
    signs = jnp.array([hip_len, -hip_len, hip_len, -hip_len], dtype=jnp.float32)
    return hips, signs


def aliengo() -> RobotParams:
    """Unitree Aliengo (ref config/robot_configs.py:21-37, aliengo.urdf:98-200)."""
    hips, hip_len = _leg_layout(0.2399, 0.051, 0.083)
    return RobotParams(
        mass=jnp.float32(9.042),
        inertia=_inertia_from_urdf(
            ixx=0.033260231,
            ixy=-0.000451628,
            ixz=0.000487603,
            iyy=0.16117211,
            iyz=4.8356e-05,
            izz=0.17460442,
        ),
        base_height_des=jnp.float32(0.38),
        fz_max=jnp.float32(500.0),
        swing_height=jnp.float32(0.1),
        kp_swing=jnp.full((3,), 200.0, dtype=jnp.float32),
        kd_swing=jnp.full((3,), 20.0, dtype=jnp.float32),
        hip_offset=hips,
        hip_len=hip_len,
        l_thigh=jnp.float32(0.25),
        l_calf=jnp.float32(0.25),
        touchdown_z=jnp.float32(-0.0255),
    )


def a1() -> RobotParams:
    """Unitree A1 (ref config/robot_configs.py:40-56, a1.urdf:89-188).

    The reference multiplies the URDF trunk inertia by 10 — that fudge is the
    tuning that works, so it is reproduced here (ref robot_configs.py:50).
    """
    hips, hip_len = _leg_layout(0.183, 0.047, 0.08505)
    return RobotParams(
        mass=jnp.float32(4.713),
        inertia=_inertia_from_urdf(
            ixx=0.01683993,
            ixy=8.3902e-05,
            ixz=0.000597679,
            iyy=0.056579028,
            iyz=2.5134e-05,
            izz=0.064713601,
        )
        * 10.0,
        base_height_des=jnp.float32(0.42),
        fz_max=jnp.float32(500.0),
        swing_height=jnp.float32(0.1),
        kp_swing=jnp.full((3,), 700.0, dtype=jnp.float32),
        kd_swing=jnp.full((3,), 20.0, dtype=jnp.float32),
        hip_offset=hips,
        hip_len=hip_len,
        l_thigh=jnp.float32(0.2),
        l_calf=jnp.float32(0.2),
        touchdown_z=jnp.float32(-0.0255),
    )
