"""Multi-host launch helpers (SURVEY.md §2.4/§5.8).

The reference is single-process; its only "distribution" is a sequential
Python loop over 4 robots (ref ``scripts/isaacgym_a1.py:119-164``).  The
TPU-native scaling path is the ``jax.distributed`` multi-host runtime: every
host runs the SAME sweep program, the global scenario batch is sharded over
the `('data',)` mesh spanning all slices, and cross-scenario reductions
lower to ICI/DCN collectives automatically.

Launch (one process per host, e.g. via GCE metadata or mpirun):

    python -m your_sweep --coordinator=HOST0:1234 --num-processes=N --pid=I

or rely on the TPU pod environment where ``jax.distributed.initialize()``
autodetects everything.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Bring up the multi-host runtime (no-op if single-process).

    With no arguments, defers to ``jax.distributed.initialize()``'s
    autodetection (TPU pod metadata).  Explicit args support manual
    launches and CPU-process simulation of a pod
    (``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``/``JAX_COORDINATOR`` env vars
    are honored as fallbacks).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if num_processes in (None, 1) and coordinator is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_data_mesh() -> Mesh:
    """1-D `('data',)` mesh over every addressable chip in the job.

    Device order follows ``jax.devices()`` (slice-major), so contiguous
    batch shards live on contiguous chips and the metric all-reduces ride
    ICI within a slice before touching DCN.
    """
    return Mesh(np.asarray(jax.devices()), axis_names=("data",))


def per_host_batch(global_batch: int) -> int:
    """Scenario count this host materializes for a sharded global batch."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} not divisible by {n_proc} hosts")
    return global_batch // n_proc
