"""Device mesh setup + sharded sweep execution.

The reference has no distributed anything (single process, sequential
per-robot loop — SURVEY.md §2.4).  The TPU-native scaling axis is the
scenario batch: a 1-D `('data',)` mesh shards scenarios across chips, XLA
collectives reduce sweep metrics over ICI, and the same code runs on one
chip, a v5p host, or a multi-host slice (via ``jax.distributed``).

Per-QP tensor parallelism is intentionally absent: a condensed 120-var QP
fits comfortably in one core's VMEM, so cross-chip communication happens
only at metric-reduction boundaries — the sweep is embarrassingly parallel
and ICI traffic is O(metrics), not O(state).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None) -> Mesh:
    """1-D `('data',)` mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(tree, mesh: Mesh):
    """Place a scenario-batched pytree with the batch axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_global_batch(tree, mesh: Mesh):
    """Multi-host-safe :func:`shard_batch`: every process passes the SAME
    host-side global-batch pytree; each contributes the rows its devices
    own.  Single-process it is equivalent to :func:`shard_batch`.

    (``device_put`` of a full host array onto a sharding spanning other
    processes' devices is invalid under ``jax.distributed`` — hosts can only
    populate their addressable shards.)
    """
    sharding = NamedSharding(mesh, P("data"))
    n_proc = jax.process_count()
    if n_proc == 1:
        return shard_batch(tree, mesh)
    pid = jax.process_index()

    def put(x):
        x = np.asarray(x)
        if x.shape[0] % n_proc:
            raise ValueError(f"batch {x.shape[0]} not divisible by {n_proc} hosts")
        chunk = x.shape[0] // n_proc
        local = x[pid * chunk : (pid + 1) * chunk]
        return jax.make_array_from_process_local_data(sharding, local, x.shape)

    return jax.tree.map(put, tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


# Computation follows data: once inputs are placed with ``shard_batch``, a
# plain ``jax.jit`` propagates the 'data' sharding through the whole sweep
# program SPMD-style, and any cross-scenario reduction (e.g. ``jnp.mean``
# over the batch axis of metrics) lowers to an all-reduce over ICI.  See
# ``parallel/sweep.py`` for the assembled entry points.
