"""Pure gait phase machinery.

The reference mutates phase state on a shared ``Gait`` enum member
(reference ``linear_mpc/gait.py:76-135``); here every quantity is a pure
function of ``(tick, GaitParams, MpcParams)`` so the whole schedule is
jittable and batchable (a gait sweep is a batch axis over ``GaitParams``).

Semantics reproduced exactly:

- ``iteration = floor(tick / iters_between_mpc) mod num_segments`` and
  ``phase = (tick mod (iters * num_segments)) / (iters * num_segments)``
  (ref gait.py:76-79);
- the gait table looks one segment *ahead*: horizon slot ``i`` uses segment
  ``(i + 1 + iteration) mod num_segments`` (ref gait.py:89);
- swing/stance phase normalization treats a leg exactly at the end of its
  window (state == duration) as still in the window — the comparison is
  strict ``>`` (ref gait.py:116,130);
- the reference's swing-offset wrap (ref gait.py:104-106) subtracts 1 from
  the *whole array* when any entry exceeds 1 — a latent bug that never fires
  for the shipped gaits (their offsets+durations never exceed 1).  We use the
  per-element wrap, which is identical on every defined gait.

Swing/stance *times* are measured with ``dt_control * iterations_between_mpc``
(= 0.02 s), not the MPC prediction dt (ref gait.py:70-74) — quirk preserved.
"""
from __future__ import annotations

import jax.numpy as jnp

from pympc_quadruped_tpu.models.gaits import GaitParams
from pympc_quadruped_tpu.models.mpc import MpcParams


def phase_of_tick(gait: GaitParams, mpc: MpcParams, tick: jnp.ndarray):
    """Returns (iteration, phase): segment index (int32) and cycle phase in [0,1)."""
    iters = mpc.iterations_between_mpc
    iteration = (tick // iters) % gait.num_segments
    period = iters * gait.num_segments
    phase = (tick % period).astype(jnp.float32) / period.astype(jnp.float32)
    return iteration, phase


def gait_table(gait: GaitParams, mpc: MpcParams, tick: jnp.ndarray) -> jnp.ndarray:
    """(horizon*4,) stance table for the MPC force bounds — 1 stance, 0 swing.

    Row-major over (horizon step, leg), matching the reference layout
    (ref gait.py:81-100).
    """
    iteration, _ = phase_of_tick(gait, mpc, tick)
    steps = jnp.arange(mpc.horizon, dtype=jnp.int32)
    seg = (steps + 1 + iteration) % gait.num_segments            # (h,)
    cur = seg[:, None] - gait.stance_offsets[None, :]            # (h,4)
    cur = jnp.where(cur < 0, cur + gait.num_segments, cur)
    table = (cur < gait.stance_durations[None, :]).astype(jnp.float32)
    return table.reshape(-1)


def _window_state(phase, offsets_n, durations_n):
    """Shared swing/stance normalization (ref gait.py:102-135).

    A zero-duration window (STANDING's swing phase) yields 0 ("not in this
    phase"), not the reference's 0/0 NaN at the window start — downstream
    consumers compare ``swing_state == 0.0`` to pick stance, and a NaN there
    would silently mark a standing leg as swinging.
    """
    state = phase - offsets_n
    state = jnp.where(state < 0.0, state + 1.0, state)
    safe_dur = jnp.where(durations_n > 0.0, durations_n, 1.0)
    return jnp.where(
        (state > durations_n) | (durations_n <= 0.0), 0.0, state / safe_dur
    )


def swing_state(gait: GaitParams, mpc: MpcParams, tick: jnp.ndarray) -> jnp.ndarray:
    """(4,) normalized swing phase per leg: 0 = not swinging, (0,1] = progress."""
    _, phase = phase_of_tick(gait, mpc, tick)
    num = gait.num_segments.astype(jnp.float32)
    offsets_n = gait.stance_offsets.astype(jnp.float32) / num
    durations_n = gait.stance_durations.astype(jnp.float32) / num
    swing_offsets = offsets_n + durations_n
    swing_offsets = jnp.where(swing_offsets > 1.0, swing_offsets - 1.0, swing_offsets)
    swing_durations = 1.0 - durations_n
    return _window_state(phase, swing_offsets, swing_durations)


def stance_state(gait: GaitParams, mpc: MpcParams, tick: jnp.ndarray) -> jnp.ndarray:
    """(4,) normalized stance phase per leg: 0 = not in stance."""
    _, phase = phase_of_tick(gait, mpc, tick)
    num = gait.num_segments.astype(jnp.float32)
    offsets_n = gait.stance_offsets.astype(jnp.float32) / num
    durations_n = gait.stance_durations.astype(jnp.float32) / num
    return _window_state(phase, offsets_n, durations_n)


def swing_time(gait: GaitParams, mpc: MpcParams) -> jnp.ndarray:
    """Total swing duration in seconds (ref gait.py:69-70,137-144)."""
    return mpc.dt_gait * gait.total_swing_segments.astype(jnp.float32)


def stance_time(gait: GaitParams, mpc: MpcParams) -> jnp.ndarray:
    """Total stance duration in seconds (ref gait.py:72-74,146-150)."""
    return mpc.dt_gait * gait.total_stance_segments.astype(jnp.float32)
