"""Profiling / tracing harness (SURVEY.md §5.1).

The reference times its QP solve with wall-clock prints
(ref ``linear_mpc/mpc.py:98-101``).  Here:

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of everything inside;
- :func:`stage_timings` — steady-state latency of a jitted callable with
  p50/p99 against the reference's real-time budgets (20 ms MPC solve,
  1 ms tick — ref ``config/linear_mpc_configs.py:6-9``);
- :func:`throughput` — pipelined calls (sync only at the end), the right
  protocol on remote-tunneled devices where per-call sync inflates latency.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np

MPC_BUDGET_MS = 20.0   # 50 Hz solve window (ref linear_mpc_configs.py:7)
TICK_BUDGET_MS = 1.0   # 1 kHz control tick (ref linear_mpc_configs.py:6)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): fn(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_timings(fn: Callable, *args, iters: int = 20, warmup: int = 2,
                  budget_ms: float = MPC_BUDGET_MS) -> Dict[str, float]:
    """Per-call latency distribution of a (jitted) callable, fully synced."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts = np.asarray(ts)
    return {
        "p50_ms": float(np.percentile(ts, 50) * 1e3),
        "p99_ms": float(np.percentile(ts, 99) * 1e3),
        "min_ms": float(ts.min() * 1e3),
        "budget_ms": budget_ms,
        "within_budget": bool(np.percentile(ts, 99) * 1e3 < budget_ms),
    }


def throughput(fn: Callable, *args, iters: int = 20, warmup: int = 2,
               items_per_call: int = 1) -> Dict[str, float]:
    """Steady-state throughput with pipelined dispatch (single final sync)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {
        "ms_per_call": float(dt * 1e3),
        "items_per_s": float(items_per_call / dt),
    }
