from pympc_quadruped_tpu.control.controller import (
    ControllerCarry,
    ControllerOutput,
    init_carry,
    step,
    step_batch,
)

__all__ = [
    "ControllerCarry",
    "ControllerOutput",
    "init_carry",
    "step",
    "step_batch",
]
