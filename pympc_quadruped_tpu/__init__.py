"""pympc_quadruped_tpu — a TPU-native convex-MPC engine for quadruped locomotion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
``yinghansun/pympc-quadruped`` (single-rigid-body linear MPC, gait scheduling,
swing-foot trajectories, Jacobian-transpose leg control), re-designed TPU-first:

- everything below the application layer is pure functions over pytrees,
- the scenario batch is a leading axis everywhere (``vmap`` / ``shard_map``),
- the condensed QP is solved by a batched fixed-iteration solver that runs in
  lockstep across thousands of scenarios on the MXU,
- multi-chip scaling uses ``jax.sharding.Mesh`` + collectives over ICI.

Layer map (bottom-up), mirroring SURVEY.md §7:

==============  ==================================================================
``models``      pytree param dataclasses: robots, gaits, MPC config, commands
``ops``         jittable math: Lie/quat ops, closed-form leg kinematics,
                SRB state-space + exact ZOH discretization, QP condensing,
                batched QP solvers (ADMM / predictor-corrector IPM)
``control``     swing-foot trajectories, leg torque mapping, reference
                trajectory generation, the full 1 kHz controller tick
``env``         batched on-device SRB physics rollouts for closed-loop sweeps
``estimation``  two-stage Kalman-filter state estimator
``parallel``    device mesh setup, sharded sweep runner, collectives
``oracle``      pure-numpy float64 golden implementation of the reference
                semantics (used by tests; never imported by the TPU path)
==============  ==================================================================

Joint/leg ordering contract (tested in ``tests/test_conventions.py``):
legs are always ordered **FL, FR, RL, RR** and joints **(hip, thigh, calf)**
within each leg.  This matches the reference's MJCF sensor/actuator order
(reference ``robot/aliengo/aliengo.xml:210-253``) and — because urdfdom stores
joints in a name-keyed map — also the order Pinocchio assigns to the reference
URDFs.  Quaternions are ``(w, x, y, z)`` (MuJoCo convention, reference
``utils/robot_data.py:83-86``).
"""

__version__ = "0.1.0"

import jax as _jax

# Control-grade matmul precision, framework-wide.  On TPU, JAX's DEFAULT
# matmul precision runs bf16 multiply passes; for neural nets that is the
# right trade, but this package computes physics, kinematics and QP data,
# where the silent ~2^-8 relative rounding is a correctness bug: the
# state-space/discretization matmuls (`ops/srb.py`) fed every solver Ad/Bd
# contaminated at ~1e-3, measured as a 6e-5 cold-solve optimality gap vs
# the f64 oracle on the TPU lane where the CPU lane (full-f32 matmuls)
# sits at 5e-9 (tests/test_riccati.py::test_cold_quality_*).  The MXU-hot
# paths (condensing, the Pallas kernels) pin their precision explicitly,
# so this default only affects the small/cheap matmuls — full f32 there is
# the semantics the CPU test lane already validates.  Users embedding this
# package alongside bf16 model code can override per-scope with
# ``jax.default_matmul_precision``.
_jax.config.update("jax_default_matmul_precision", "highest")

from pympc_quadruped_tpu.models.robots import RobotParams, aliengo, a1
from pympc_quadruped_tpu.models.gaits import GaitParams, Gaits
from pympc_quadruped_tpu.models.mpc import MpcParams, default_mpc_params

__all__ = [
    "RobotParams",
    "aliengo",
    "a1",
    "GaitParams",
    "Gaits",
    "MpcParams",
    "default_mpc_params",
]
