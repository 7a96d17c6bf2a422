from pympc_quadruped_tpu.ops.qp.cones import (
    CONE_ROWS_PER_BLOCK,
    block_constraints,
    mask_cost,
    variable_mask,
)
from pympc_quadruped_tpu.ops.qp.ipm import IpmConfig, solve_batch as ipm_solve_batch
from pympc_quadruped_tpu.ops.qp.admm import AdmmConfig, solve_batch as admm_solve_batch

__all__ = [
    "CONE_ROWS_PER_BLOCK",
    "block_constraints",
    "mask_cost",
    "variable_mask",
    "IpmConfig",
    "ipm_solve_batch",
    "AdmmConfig",
    "admm_solve_batch",
]
