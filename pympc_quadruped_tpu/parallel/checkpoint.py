"""Checkpoint / resume for long scenario sweeps (orbax-backed).

The reference is stateless (live sim + controller object, nothing persisted
— SURVEY.md §5.4); at pod scale a randomization sweep is a long-running job
whose state (env states, controller carries, PRNG keys, tick counter,
accumulated metrics) must survive preemption.  ``SweepCheckpointer`` wraps
orbax's ``CheckpointManager`` around an arbitrary sweep-state pytree:

    ckpt = SweepCheckpointer(dir, keep=3)
    state = ckpt.restore_or(init_state)       # resume if a step exists
    while ...:
        state = run_chunk(state)
        ckpt.save(step, state)                # async, non-blocking
    ckpt.close()

Works unchanged under multi-host ``jax.distributed`` (orbax coordinates the
per-host shards of a sharded pytree).
"""
from __future__ import annotations

import os
from typing import Any

import jax


class SweepCheckpointer:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, enable_async_checkpointing=async_save
            ),
        )

    @property
    def latest_step(self):
        return self._mgr.latest_step()

    def save(self, step: int, state: Any) -> None:
        """Asynchronously persist the sweep-state pytree at ``step``."""
        self._mgr.save(step, args=self._ocp.args.StandardSave(state))

    def restore_or(self, init_state: Any):
        """Resume from the latest step, or return ``init_state`` untouched.

        Restores with the dtypes/shapes/shardings of ``init_state`` as the
        abstract target, so a resumed sweep keeps its mesh placement.
        """
        step = self._mgr.latest_step()
        if step is None:
            return 0, init_state
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape")
            else x,
            init_state,
        )
        restored = self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(abstract)
        )
        return step, restored

    def wait(self) -> None:
        """Block until pending async saves are durable."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
