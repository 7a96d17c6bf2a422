"""Gait definitions as data.

The reference encodes each gait as an enum member carrying
``(name, num_segments, per-leg stance offsets, per-leg stance durations)``
and mutates shared phase state on the enum singleton (reference
``linear_mpc/gait.py:10-79``).  Here a gait is a plain pytree of arrays; all
phase machinery lives in pure functions (:mod:`pympc_quadruped_tpu.ops.gaitsched`)
of ``(tick, GaitParams)`` so gaits can be a batch axis — a 256-scenario gait
sweep is ``vmap`` over ``GaitParams`` with matching ``num_segments``.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GaitParams:
    """One periodic gait.

    ``num_segments`` MPC segments per gait cycle; leg ``j`` is in stance for
    ``stance_durations[j]`` segments starting at segment ``stance_offsets[j]``.
    All four legs share a common swing/stance split (the reference computes
    cycle-level swing/stance times from leg 0, ref gait.py:40-41).
    """

    num_segments: jnp.ndarray      # int32 scalar
    stance_offsets: jnp.ndarray    # (4,) int32
    stance_durations: jnp.ndarray  # (4,) int32

    @property
    def total_stance_segments(self) -> jnp.ndarray:
        return self.stance_durations[0]

    @property
    def total_swing_segments(self) -> jnp.ndarray:
        return self.num_segments - self.stance_durations[0]


def _gait(num_segments, offsets, durations) -> GaitParams:
    return GaitParams(
        num_segments=jnp.int32(num_segments),
        stance_offsets=jnp.asarray(offsets, dtype=jnp.int32),
        stance_durations=jnp.asarray(durations, dtype=jnp.int32),
    )


class Gaits:
    """The gait library of the reference (ref gait.py:16-22), as constructors."""

    @staticmethod
    def standing() -> GaitParams:
        return _gait(16, [0, 0, 0, 0], [16, 16, 16, 16])

    @staticmethod
    def trotting16() -> GaitParams:
        return _gait(16, [0, 8, 8, 0], [8, 8, 8, 8])

    @staticmethod
    def trotting10() -> GaitParams:
        return _gait(10, [0, 5, 5, 0], [5, 5, 5, 5])

    @staticmethod
    def jumping16() -> GaitParams:
        return _gait(16, [0, 0, 0, 0], [4, 4, 4, 4])

    @staticmethod
    def pacing16() -> GaitParams:
        return _gait(16, [8, 0, 8, 0], [8, 8, 8, 8])

    @staticmethod
    def pacing10() -> GaitParams:
        return _gait(10, [5, 0, 5, 0], [5, 5, 5, 5])

    @staticmethod
    def bounding8() -> GaitParams:
        """Bounding, commented out in the reference (ref gait.py:20) but kept
        here as a usable gait — front pair then rear pair."""
        return _gait(8, [4, 4, 0, 0], [4, 4, 4, 4])

    @staticmethod
    def by_name(name: str) -> GaitParams:
        return {
            "standing": Gaits.standing,
            "trotting16": Gaits.trotting16,
            "trotting10": Gaits.trotting10,
            "jumping16": Gaits.jumping16,
            "pacing16": Gaits.pacing16,
            "pacing10": Gaits.pacing10,
            "bounding8": Gaits.bounding8,
        }[name]()
