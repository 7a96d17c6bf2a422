"""Procedural terrain heightfields — TPU-native equivalent of the
reference's IsaacGym terrain factory (ref ``utils/isaacgym_utils.py:267-312``:
slope / stairs / pyramid heightfields converted to PhysX trimeshes).

Here a terrain is data, not geometry: a regular height grid in a pytree with
a bilinear height query that vmaps over feet and scenarios, so terrain
becomes one more randomization axis of a sweep (every scenario can carry its
own grid).  The SRB environment queries it for stance pinning and swing
touchdown (``srb_env``).

All generators are pure functions of shape-static parameters; the random
rough terrain takes an explicit PRNG key (deterministic, reproducible).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Terrain:
    """Regular-grid heightfield.

    ``height[i, j]`` is the ground z at ``origin + (i*cell, j*cell)``.
    World coordinates outside the grid clamp to the border (flat beyond).
    """

    height: jnp.ndarray   # (H, W) float32
    cell: jnp.ndarray     # () grid spacing in meters
    origin: jnp.ndarray   # (2,) world xy of grid node (0, 0)

    @property
    def extent(self):
        H, W = self.height.shape
        return (H - 1) * self.cell, (W - 1) * self.cell


def flat(size: float = 20.0, cell: float = 0.1) -> Terrain:
    n = int(round(size / cell)) + 1
    return Terrain(
        height=jnp.zeros((n, n), jnp.float32),
        cell=jnp.float32(cell),
        origin=jnp.array([-size / 2, -size / 2], jnp.float32),
    )


def slope(grade: float, size: float = 20.0, cell: float = 0.1,
          axis: int = 0) -> Terrain:
    """Uniform slope: z = grade * distance along ``axis``
    (ref isaacgym_utils.py sloped_terrain)."""
    n = int(round(size / cell)) + 1
    coord = jnp.arange(n, dtype=jnp.float32) * cell
    h = coord[:, None] if axis == 0 else coord[None, :]
    return Terrain(
        height=jnp.broadcast_to(grade * h, (n, n)).astype(jnp.float32),
        cell=jnp.float32(cell),
        origin=jnp.array([-size / 2, -size / 2], jnp.float32),
    )


def stairs(step_width: float, step_height: float, size: float = 20.0,
           cell: float = 0.05, axis: int = 0) -> Terrain:
    """Ascending stairs along ``axis`` (ref isaacgym_utils.py stairs_terrain)."""
    n = int(round(size / cell)) + 1
    coord = jnp.arange(n, dtype=jnp.float32) * cell
    steps = jnp.floor(coord / step_width)
    h = steps * step_height
    h2d = h[:, None] if axis == 0 else h[None, :]
    return Terrain(
        height=jnp.broadcast_to(h2d, (n, n)).astype(jnp.float32),
        cell=jnp.float32(cell),
        origin=jnp.array([-size / 2, -size / 2], jnp.float32),
    )


def pyramid(slope_grade: float, platform: float = 1.0, size: float = 20.0,
            cell: float = 0.1) -> Terrain:
    """Pyramid with a flat central platform
    (ref isaacgym_utils.py pyramid_sloped_terrain)."""
    n = int(round(size / cell)) + 1
    coord = jnp.arange(n, dtype=jnp.float32) * cell - size / 2
    dx = jnp.abs(coord)[:, None]
    dy = jnp.abs(coord)[None, :]
    d = jnp.maximum(jnp.maximum(dx, dy) - platform / 2, 0.0)
    peak = slope_grade * (size / 2 - platform / 2)
    h = peak - slope_grade * d
    return Terrain(
        height=h.astype(jnp.float32),
        cell=jnp.float32(cell),
        origin=jnp.array([-size / 2, -size / 2], jnp.float32),
    )


def random_rough(key, amplitude: float = 0.03, size: float = 20.0,
                 cell: float = 0.1, smooth: int = 2) -> Terrain:
    """Uniform random roughness, box-smoothed ``smooth`` times
    (ref isaacgym_utils.py random_uniform_terrain)."""
    n = int(round(size / cell)) + 1
    h = jax.random.uniform(key, (n, n), minval=-amplitude, maxval=amplitude)
    kernel = jnp.ones((3, 3), jnp.float32) / 9.0
    for _ in range(smooth):
        hp = jnp.pad(h, 1, mode="edge")
        h = jax.scipy.signal.convolve2d(hp, kernel, mode="valid")
    return Terrain(
        height=h.astype(jnp.float32),
        cell=jnp.float32(cell),
        origin=jnp.array([-size / 2, -size / 2], jnp.float32),
    )


def height_at(terrain: Terrain, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear ground height at world ``xy`` (..., 2) -> (...,).

    Pure gather + lerp — vmappable over feet and scenarios, jittable, and
    cheap enough to query every tick for every foot.
    """
    H, W = terrain.height.shape
    uv = (xy - terrain.origin) / terrain.cell
    u = jnp.clip(uv[..., 0], 0.0, H - 1.001)
    v = jnp.clip(uv[..., 1], 0.0, W - 1.001)
    i0 = jnp.floor(u).astype(jnp.int32)
    j0 = jnp.floor(v).astype(jnp.int32)
    fu = u - i0
    fv = v - j0
    h00 = terrain.height[i0, j0]
    h10 = terrain.height[i0 + 1, j0]
    h01 = terrain.height[i0, j0 + 1]
    h11 = terrain.height[i0 + 1, j0 + 1]
    return (
        h00 * (1 - fu) * (1 - fv)
        + h10 * fu * (1 - fv)
        + h01 * (1 - fu) * fv
        + h11 * fu * fv
    )


def normal_at(terrain: Terrain, xy: jnp.ndarray, delta: float = 0.05):
    """Finite-difference surface normal at world ``xy`` (..., 2) -> (..., 3).

    The reference computes terrain normals by PCA over contact-point history
    (ref ``utils/robot_data.py:194-228`` — dead code with a row/column
    eigenvector indexing bug, never called).  Here the terrain is known
    analytically, so the normal is an exact finite difference of the field.
    """
    ex = jnp.array([delta, 0.0], jnp.float32)
    ey = jnp.array([0.0, delta], jnp.float32)
    dzdx = (height_at(terrain, xy + ex) - height_at(terrain, xy - ex)) / (2 * delta)
    dzdy = (height_at(terrain, xy + ey) - height_at(terrain, xy - ey)) / (2 * delta)
    n = jnp.stack([-dzdx, -dzdy, jnp.ones_like(dzdx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
