"""Pure-numpy float64 golden implementation of the reference semantics.

Never imported by the TPU compute path — tests and the MuJoCo harness only.
"""

from pympc_quadruped_tpu.oracle.npref import (
    OracleConfig,
    OracleController,
    OracleRobot,
    oracle_aliengo,
    oracle_a1,
    solve_qp_kkt,
)

__all__ = [
    "OracleConfig",
    "OracleController",
    "OracleRobot",
    "oracle_aliengo",
    "oracle_a1",
    "solve_qp_kkt",
]
