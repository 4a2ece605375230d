"""Dense voxel-grid queries.

TPU-native replacement for the reference's sparse hash-map VoxelGrid
(util/voxel_grid.hpp:57-165): scenario layouts fit in small fixed-shape dense
uint8 arrays, so membership tests become masked gathers that vectorize over
agents and environments.

All functions take positions with an arbitrary leading batch shape and are
written to be `jax.vmap`-able over an environment batch.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from megaverse_tpu import constants as C
from megaverse_tpu.types import GridConfig

# Small epsilon used to keep AABBs strictly inside voxel cells when touching
# boundaries (so standing exactly on a floor does not count as horizontal
# collision with it).
BOUNDARY_EPS = 1e-4


def world_to_voxel(cfg: GridConfig, p: jax.Array) -> jax.Array:
    """World position -> integer voxel coords (ref voxel_grid.hpp:144-149)."""
    return jnp.floor((p - cfg.world_min) / cfg.voxel_size).astype(jnp.int32)


def axis_index(cfg: GridConfig, axis: int, w: jax.Array) -> jax.Array:
    """World coordinate along one axis -> voxel index along that axis."""
    return jnp.floor((w - cfg.origin[axis]) / cfg.voxel_size).astype(jnp.int32)


def voxel_center(cfg: GridConfig, ii: jax.Array) -> jax.Array:
    return cfg.world_min + (ii.astype(jnp.float32) + 0.5) * cfg.voxel_size


def gather_voxel(cfg: GridConfig, field: jax.Array, ii: jax.Array) -> jax.Array:
    """Gather field values at integer coords [..., 3]; out-of-bounds -> 0."""
    dims = jnp.asarray(cfg.dims, jnp.int32)
    valid = jnp.all((ii >= 0) & (ii < dims), axis=-1)
    iic = jnp.clip(ii, 0, dims - 1)
    vals = field[iic[..., 0], iic[..., 1], iic[..., 2]]
    return jnp.where(valid, vals, jnp.zeros_like(vals))


def set_voxel(cfg: GridConfig, field: jax.Array, ii: jax.Array, value) -> jax.Array:
    """Scatter value(s) at integer coords [..., 3]; out-of-bounds writes dropped."""
    dims = jnp.asarray(cfg.dims, jnp.int32)
    valid = jnp.all((ii >= 0) & (ii < dims), axis=-1)
    iic = jnp.clip(ii, 0, dims - 1)
    value = jnp.broadcast_to(jnp.asarray(value, field.dtype), valid.shape)
    old = field[iic[..., 0], iic[..., 1], iic[..., 2]]
    value = jnp.where(valid, value, old)
    return field.at[iic[..., 0], iic[..., 1], iic[..., 2]].set(value)


def solid_at(cfg: GridConfig, vtype: jax.Array, ii: jax.Array) -> jax.Array:
    return (gather_voxel(cfg, vtype, ii) & C.VOXEL_SOLID) != 0


def span_for(cfg: GridConfig, size_world) -> Tuple[int, ...]:
    """Static per-axis voxel span (max cells covered) for a box of given size.

    An interval of length L at arbitrary alignment overlaps up to
    floor(L / voxel) + 2 cells (e.g. L = 0.66 straddling a cell boundary
    covers 2). The previous +1 bound assumed aligned placement and let a
    wall-straddling capsule footprint skip the far column (momentary
    tunneling, wrong floor detection on ledges)."""
    return tuple(int(math.floor(s / cfg.voxel_size)) + 2 for s in size_world)


def _offsets(*spans: int) -> jax.Array:
    """[prod(spans), len(spans)] integer offset table (static)."""
    grids = jnp.meshgrid(*[jnp.arange(s) for s in spans], indexing="ij")
    return jnp.stack(grids, axis=-1).reshape(-1, len(spans))


def aabb_hits_solid(
    cfg: GridConfig,
    vtype: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    span: Tuple[int, int, int],
) -> jax.Array:
    """True if world AABB [lo, hi] overlaps any SOLID voxel.

    `span` is the static maximum number of voxels the box can cover per axis.
    lo/hi: [..., 3] -> bool [...].
    """
    i0 = world_to_voxel(cfg, lo + BOUNDARY_EPS)
    i1 = world_to_voxel(cfg, hi - BOUNDARY_EPS)
    off = _offsets(*span)  # [S, 3]
    ii = i0[..., None, :] + off  # [..., S, 3]
    in_range = jnp.all(ii <= i1[..., None, :], axis=-1)  # [..., S]
    return jnp.any(solid_at(cfg, vtype, ii) & in_range, axis=-1)


def highest_floor_below(
    cfg: GridConfig,
    vtype: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    z0: jax.Array,
    z1: jax.Array,
    bottom: jax.Array,
    max_drop: float,
    span_xz: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Landing height for a box footprint x[x0,x1] z[z0,z1] dropping from `bottom`.

    Scans columns under the footprint for the highest SOLID voxel whose top
    surface lies in [bottom - max_drop, bottom + eps]; returns (top_y, found).
    Mirrors the stepDown convex sweep (kinematic_character_controller.cpp:400-442)
    specialized to axis-aligned voxel geometry.
    """
    sx, sz = span_xz
    n_down = int(math.ceil(max_drop / cfg.voxel_size)) + 2

    ix0 = axis_index(cfg, 0, x0 + BOUNDARY_EPS)
    ix1 = axis_index(cfg, 0, x1 - BOUNDARY_EPS)
    iz0 = axis_index(cfg, 2, z0 + BOUNDARY_EPS)
    iz1 = axis_index(cfg, 2, z1 - BOUNDARY_EPS)
    # Highest voxel whose TOP is at or below the capsule bottom (+ eps).
    iy_top = axis_index(cfg, 1, bottom + BOUNDARY_EPS) - 1

    offs = _offsets(sx, n_down, sz)  # [S, 3]
    ii = jnp.stack(
        [
            ix0[..., None] + offs[..., 0],
            iy_top[..., None] - offs[..., 1],
            iz0[..., None] + offs[..., 2],
        ],
        axis=-1,
    )  # [..., S, 3]
    in_range = (ii[..., 0] <= ix1[..., None]) & (ii[..., 2] <= iz1[..., None])
    solid = solid_at(cfg, vtype, ii) & in_range

    top_y = cfg.origin[1] + (ii[..., 1].astype(jnp.float32) + 1.0) * cfg.voxel_size
    cand = solid & (top_y >= (bottom - max_drop)[..., None])
    top_best = jnp.max(jnp.where(cand, top_y, -jnp.inf), axis=-1)
    return top_best, jnp.any(cand, axis=-1)


def lowest_ceiling_above(
    cfg: GridConfig,
    vtype: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    z0: jax.Array,
    z1: jax.Array,
    top: jax.Array,
    max_rise: float,
    span_xz: Tuple[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Ceiling height for a box footprint rising from `top`.

    Returns (bottom_y_of_ceiling, found) for the lowest SOLID voxel whose bottom
    lies in [top - eps, top + max_rise). Mirrors stepUp (kcc.cpp:223-304).
    """
    sx, sz = span_xz
    n_up = int(math.ceil(max_rise / cfg.voxel_size)) + 2

    ix0 = axis_index(cfg, 0, x0 + BOUNDARY_EPS)
    ix1 = axis_index(cfg, 0, x1 - BOUNDARY_EPS)
    iz0 = axis_index(cfg, 2, z0 + BOUNDARY_EPS)
    iz1 = axis_index(cfg, 2, z1 - BOUNDARY_EPS)
    # Lowest voxel whose BOTTOM is at or above the capsule top (- eps).
    iy_bot = axis_index(cfg, 1, top - BOUNDARY_EPS) + 1

    offs = _offsets(sx, n_up, sz)
    ii = jnp.stack(
        [
            ix0[..., None] + offs[..., 0],
            iy_bot[..., None] + offs[..., 1],
            iz0[..., None] + offs[..., 2],
        ],
        axis=-1,
    )
    in_range = (ii[..., 0] <= ix1[..., None]) & (ii[..., 2] <= iz1[..., None])
    solid = solid_at(cfg, vtype, ii) & in_range

    bot_y = cfg.origin[1] + ii[..., 1].astype(jnp.float32) * cfg.voxel_size
    cand = solid & (bot_y < (top + max_rise)[..., None])
    bot_best = jnp.min(jnp.where(cand, bot_y, jnp.inf), axis=-1)
    return bot_best, jnp.any(cand, axis=-1)
