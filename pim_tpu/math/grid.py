"""Uniform spatial grid: AABB -> cell index math (backs the light grid).

Counterpart of the reference's src/math/grid.h:8-50.  Grid extents are
static Python ints (XLA needs static shapes); position math is jnp.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class GridSpec(NamedTuple):
    lo: jnp.ndarray       # [3] world-space lower bound
    size: Tuple[int, int, int]  # static cell counts per axis
    cells_per_meter: float


def make_grid(bounds_lo, bounds_hi, cells_per_meter: float) -> GridSpec:
    lo = np.asarray(bounds_lo, np.float32)
    hi = np.asarray(bounds_hi, np.float32)
    sizef = np.ceil((hi - lo) * cells_per_meter)
    size = tuple(int(max(s, 1)) for s in sizef)
    return GridSpec(lo=jnp.asarray(lo), size=size, cells_per_meter=float(cells_per_meter))


def grid_len(grid: GridSpec) -> int:
    return grid.size[0] * grid.size[1] * grid.size[2]


def grid_position(grid: GridSpec, index: jnp.ndarray) -> jnp.ndarray:
    """Cell index -> center position (ref grid.h:24-39)."""
    sx, sy, sz = grid.size
    ix = index % sx
    iy = (index // sx) % sy
    iz = index // (sx * sy)
    mpc = jnp.float32(1.0 / grid.cells_per_meter)
    offs = jnp.stack(
        [
            (ix.astype(jnp.float32) + 0.5) * mpc,
            (iy.astype(jnp.float32) + 0.5) * mpc,
            (iz.astype(jnp.float32) + 0.5) * mpc,
        ],
        axis=-1,
    )
    return grid.lo + offs


def grid_index(grid: GridSpec, position: jnp.ndarray) -> jnp.ndarray:
    """Position [..., 3] -> clamped flat cell index (ref grid.h:41-50)."""
    sx, sy, sz = grid.size
    offs = (position - grid.lo) * jnp.float32(grid.cells_per_meter)
    x = jnp.clip(offs[..., 0].astype(jnp.int32), 0, sx - 1)
    y = jnp.clip(offs[..., 1].astype(jnp.int32), 0, sy - 1)
    z = jnp.clip(offs[..., 2].astype(jnp.int32), 0, sz - 1)
    return x + y * sx + z * (sx * sy)


def grid_index_soa(grid: GridSpec, position) -> jnp.ndarray:
    """SoA V3 position -> clamped flat cell index."""
    sx, sy, sz = grid.size
    cpm = jnp.float32(grid.cells_per_meter)
    x = jnp.clip(((position.x - grid.lo[0]) * cpm).astype(jnp.int32), 0, sx - 1)
    y = jnp.clip(((position.y - grid.lo[1]) * cpm).astype(jnp.int32), 0, sy - 1)
    z = jnp.clip(((position.z - grid.lo[2]) * cpm).astype(jnp.int32), 0, sz - 1)
    return x + y * sx + z * (sx * sy)
