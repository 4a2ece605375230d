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
    """Scatter value(s) at integer coords [..., 3]; out-of-bounds writes are
    DROPPED (not clamped-and-rewritten: a masked row re-writing the old value
    at a clipped cell races against a genuine write to the same cell —
    scatter order is unspecified, and the stale value can win). Callers mask
    inactive rows by passing coords of -1."""
    dims = jnp.asarray(cfg.dims, jnp.int32)
    valid = jnp.all((ii >= 0) & (ii < dims), axis=-1)
    # sentinel must be positive out-of-range: negative indices WRAP in jax
    # advanced indexing before mode="drop" is applied
    ioob = jnp.where(valid[..., None], ii, dims)
    value = jnp.broadcast_to(jnp.asarray(value, field.dtype), valid.shape)
    return field.at[ioob[..., 0], ioob[..., 1], ioob[..., 2]].set(
        value, mode="drop")


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


# ---------------------------------------------------------------------------
# Packed-column queries: the SOLID bit packed along Y into u32 words per
# (x, z) column. One 2x2-column gather + bit tests replaces the 12-27-cell
# 3-D gathers of the generic queries — gathers are the expensive primitive on
# TPU, and the per-step repack is a cheap streaming reduction over the grid.
# Semantics (incl. BOUNDARY_EPS index rounding) are identical to the generic
# functions above; tests pin the physics behavior either way.
# ---------------------------------------------------------------------------

def pack_solid_columns_np(vtype) -> "np.ndarray":
    """Host-side (numpy) twin of pack_solid_columns, bit-identical layout.

    Used by layout generation to ship the packed grid in SceneData so the
    device never re-scans the full voxel grid per step (the scan was the
    single largest sim-side HBM term: ObstaclesHard reads 671 MB/step at
    1024 envs)."""
    import numpy as np

    x, y, z = vtype.shape
    w = -(-y // 32)
    solid = ((vtype & C.VOXEL_SOLID) != 0).astype(np.uint32)
    if w * 32 - y:
        solid = np.pad(solid, ((0, 0), (0, w * 32 - y), (0, 0)))
    solid = solid.reshape(x, w, 32, z)
    shifts = np.arange(32, dtype=np.uint32)[None, None, :, None]
    return np.sum(solid << shifts, axis=2, dtype=np.uint32)


def update_cols(cfg: GridConfig, cols: jax.Array, ii: jax.Array,
                solid) -> jax.Array:
    """Set/clear the SOLID bit of packed columns at integer coords [..., 3].

    Out-of-bounds writes are dropped (pass coords of -1 to mask rows out);
    `solid` is a boolean (broadcast to the coord batch). Must be called
    alongside every runtime voxel mutation that changes VOXEL_SOLID so
    state.cols stays bit-equal to packing the mutated dense grid (asserted
    by tests).

    Implementation note: multiple coords may share one packed WORD (same
    x,z column, different y), so a read-modify-write scatter would lose
    bits to scatter-order races. The update is therefore a scatter-ADD of
    single-bit deltas guarded by the bit's CURRENT value — associative and
    exact. Precondition: no two rows may name the SAME CELL (callers'
    conflict resolution guarantees it; same cell twice would double-add)."""
    dims = jnp.asarray(cfg.dims, jnp.int32)
    valid = jnp.all((ii >= 0) & (ii < dims), axis=-1)
    iic = jnp.clip(ii, 0, dims - 1)
    xw = iic[..., 0]
    yw = iic[..., 1] >> 5
    zw = iic[..., 2]
    bit = jnp.uint32(1) << (iic[..., 1] & 31).astype(jnp.uint32)
    old = cols[xw, yw, zw]
    already = (old & bit) != 0
    solid = jnp.broadcast_to(jnp.asarray(solid, bool), valid.shape)
    delta = jnp.where(valid & (solid != already), bit, jnp.uint32(0))
    delta = jnp.where(solid, delta, jnp.uint32(0) - delta)  # wraparound sub
    return cols.at[xw, yw, zw].add(delta)


def solid_from_cols(cfg: GridConfig, cols: jax.Array, ii: jax.Array) -> jax.Array:
    """SOLID flag at integer coords [..., 3] from packed columns.

    Equivalent to (gather_voxel(vtype) & VOXEL_SOLID) != 0; out-of-bounds
    coords read False (matching gather_voxel's zero fill)."""
    dims = jnp.asarray(cfg.dims, jnp.int32)
    valid = jnp.all((ii >= 0) & (ii < dims), axis=-1)
    iic = jnp.clip(ii, 0, dims - 1)
    word = cols[iic[..., 0], iic[..., 1] >> 5, iic[..., 2]]
    bit = (word >> (iic[..., 1] & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return valid & (bit != 0)


def _col_word(cols: jax.Array, xc, wi, zc) -> jax.Array:
    """cols[x, wi, z] with wi clamped and out-of-range words reading 0."""
    W = cols.shape[-2]
    w = cols[xc, jnp.minimum(wi, W - 1), zc]
    return jnp.where(wi < W, w, jnp.uint32(0))


def first_free_above(cfg: GridConfig, cols: jax.Array, ii: jax.Array,
                     max_scan: int) -> jax.Array:
    """Climb coords [..., 3] upward while their voxel is SOLID, capped at
    max_scan steps — bit-exact replacement for the sequential loop
    `voxel.y += 1 while solid_from_cols(voxel)` (FallDetectionComponent's
    respawn climb, component_fall_detection.hpp:49-56): the packed column
    words already hold the whole Y range, so ONE two-word gather plus a
    count-trailing-ones replaces max_scan gathers. Out-of-bounds coords
    read "free" and stay put, exactly like the loop (solid_from_cols
    returns False there). Requires max_scan <= 32."""
    assert max_scan <= 32
    dims = jnp.asarray(cfg.dims, jnp.int32)
    x, y0, z = ii[..., 0], ii[..., 1], ii[..., 2]
    xz_ok = ((x >= 0) & (x < dims[0]) & (z >= 0) & (z < dims[2])
             & (y0 >= 0))
    xc = jnp.clip(x, 0, dims[0] - 1)
    zc = jnp.clip(z, 0, dims[2] - 1)
    y0c = jnp.maximum(y0, 0)
    wi = y0c >> 5
    s = (y0c & 31).astype(jnp.uint32)
    w0 = _col_word(cols, xc, wi, zc)
    w1 = _col_word(cols, xc, wi + 1, zc)
    # 32-bit window: bit k = SOLID at cell y0 + k (bits past the grid top
    # are 0 = free, matching the loop's out-of-bounds stop)
    win = (w0 >> s) | jnp.where(s == 0, jnp.uint32(0),
                                w1 << (jnp.uint32(32) - s))
    m = ~win                           # 1 = free
    t = m & (~m + jnp.uint32(1))       # lowest set bit
    dy = jnp.where(m == 0, jnp.int32(32),
                   31 - jax.lax.clz(t).astype(jnp.int32))
    dy = jnp.where(xz_ok, jnp.minimum(dy, max_scan), 0)
    return ii.at[..., 1].set(y0 + dy)


def pack_solid_columns(cfg: GridConfig, vtype: jax.Array) -> jax.Array:
    """[X, Y, Z] voxel flags -> u32 [X, W, Z], W = ceil(Y/32); bit y%32 of
    word y//32 is the SOLID flag of cell y."""
    x, y, z = cfg.dims
    w = -(-y // 32)
    solid = ((vtype & C.VOXEL_SOLID) != 0).astype(jnp.uint32)
    pad = w * 32 - y
    if pad:
        solid = jnp.pad(solid, ((0, 0), (0, pad), (0, 0)))
    solid = solid.reshape(x, w, 32, z)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]
    return jnp.sum(solid << shifts, axis=2, dtype=jnp.uint32)


def _gather_cols(cfg: GridConfig, cols: jax.Array, ix: jax.Array, iz: jax.Array):
    """Column words at integer (ix, iz) [...]; out of bounds -> 0.
    Returns u32 [..., W]."""
    x, _, z = cfg.dims
    valid = (ix >= 0) & (ix < x) & (iz >= 0) & (iz < z)
    ixc = jnp.clip(ix, 0, x - 1)
    izc = jnp.clip(iz, 0, z - 1)
    vals = cols[ixc, :, izc]  # [..., W]
    return jnp.where(valid[..., None], vals, 0)


def _mask_below(h: jax.Array) -> jax.Array:
    """u32 mask with bits [0, h) set; h in [0, 32]."""
    h = jnp.clip(h, 0, 32)
    full = h >= 32
    m = (jnp.uint32(1) << jnp.clip(h, 0, 31).astype(jnp.uint32)) - jnp.uint32(1)
    return jnp.where(full, jnp.uint32(0xFFFFFFFF), m)


def _range_mask(y0: jax.Array, y1: jax.Array, word: int) -> jax.Array:
    """u32 mask of bits for cells [y0, y1] inclusive within word index."""
    return _mask_below(y1 + 1 - 32 * word) & ~_mask_below(y0 - 32 * word)


def _highest_bit(v: jax.Array) -> jax.Array:
    """Index of highest set bit of u32 (undefined 0 -> returns 0)."""
    hb = jnp.zeros(v.shape, jnp.uint32)
    for s in (16, 8, 4, 2, 1):
        big = (v >> (hb + s)) > 0
        hb = jnp.where(big, hb + s, hb)
    return hb.astype(jnp.int32)


def _lowest_bit(v: jax.Array) -> jax.Array:
    iso = v & (~v + jnp.uint32(1))
    return _highest_bit(iso)


def _footprint_cols(cfg: GridConfig, cols, x0, x1, z0, z1, span_xz):
    """Gather the (<= sx*sz) column words under a footprint with in-range
    mask. Returns (words u32 [..., S, W], in_range bool [..., S])."""
    sx, sz = span_xz
    ix0 = axis_index(cfg, 0, x0 + BOUNDARY_EPS)
    ix1 = axis_index(cfg, 0, x1 - BOUNDARY_EPS)
    iz0 = axis_index(cfg, 2, z0 + BOUNDARY_EPS)
    iz1 = axis_index(cfg, 2, z1 - BOUNDARY_EPS)
    off = _offsets(sx, sz)  # [S, 2]
    ix = ix0[..., None] + off[..., 0]
    iz = iz0[..., None] + off[..., 1]
    in_range = (ix <= ix1[..., None]) & (iz <= iz1[..., None])
    return _gather_cols(cfg, cols, ix, iz), in_range


def cols_aabb_hits_solid(cfg, cols, lo, hi, span_xz) -> jax.Array:
    """aabb_hits_solid on packed columns. lo/hi [..., 3] -> bool [...]."""
    words, in_range = _footprint_cols(
        cfg, cols, lo[..., 0], hi[..., 0], lo[..., 2], hi[..., 2], span_xz)
    iy0 = axis_index(cfg, 1, lo[..., 1] + BOUNDARY_EPS)
    iy1 = axis_index(cfg, 1, hi[..., 1] - BOUNDARY_EPS)
    ny = cfg.dims[1]
    iy0 = jnp.maximum(iy0, 0)[..., None]
    iy1 = jnp.minimum(iy1, ny - 1)[..., None]
    hit = jnp.zeros(words.shape[:-2], bool)
    for w in range(words.shape[-1]):
        m = _range_mask(iy0, iy1, w)
        hit = hit | jnp.any(in_range & ((words[..., w] & m) != 0), axis=-1)
    return hit


def cols_cell_solid(cfg, cols, ix, iz, ylo, yhi) -> jax.Array:
    """Any SOLID bit in column (ix, iz) within world-y range [ylo, yhi].

    Single-column variant of cols_aabb_hits_solid (same BOUNDARY_EPS index
    rounding); ix/iz integer arrays [...], ylo/yhi world coords [...]."""
    words = _gather_cols(cfg, cols, ix, iz)
    iy0 = jnp.maximum(axis_index(cfg, 1, ylo + BOUNDARY_EPS), 0)
    iy1 = jnp.minimum(axis_index(cfg, 1, yhi - BOUNDARY_EPS), cfg.dims[1] - 1)
    hit = jnp.zeros(jnp.shape(ix), bool)
    for w in range(words.shape[-1]):
        m = _range_mask(iy0, iy1, w)
        hit = hit | ((words[..., w] & m) != 0)
    return hit


def cols_highest_floor_below(cfg, cols, x0, x1, z0, z1, bottom, max_drop,
                             span_xz):
    """highest_floor_below on packed columns -> (top_y, found)."""
    words, in_range = _footprint_cols(cfg, cols, x0, x1, z0, z1, span_xz)
    iy_top = axis_index(cfg, 1, bottom + BOUNDARY_EPS) - 1
    # floor top must lie in [bottom - max_drop, bottom]: top = (y+1)*vs + org.
    # -1 widens one cell so the exact-equality candidate survives; the top_y
    # post-filter restores the precise bound.
    iy_lo = axis_index(cfg, 1, bottom - max_drop) - 1
    ny = cfg.dims[1]
    iy0 = jnp.clip(iy_lo, 0, ny - 1)[..., None]
    iy1 = jnp.clip(iy_top, -1, ny - 1)[..., None]
    best = jnp.full(words.shape[:-1], -1, jnp.int32)  # [..., S]
    for w in range(words.shape[-1]):
        m = _range_mask(iy0, iy1, w)
        bits = words[..., w] & m
        hb = _highest_bit(bits) + 32 * w
        best = jnp.where((bits != 0) & in_range, jnp.maximum(best, hb), best)
    best = jnp.max(best, axis=-1)  # [...]
    found = best >= 0
    top_y = cfg.origin[1] + (best.astype(jnp.float32) + 1.0) * cfg.voxel_size
    # keep exact generic-path filter: top within [bottom - max_drop, bottom]
    ok = found & (top_y >= bottom - max_drop)
    return jnp.where(ok, top_y, -jnp.inf), ok


def cols_lowest_ceiling_above(cfg, cols, x0, x1, z0, z1, top, max_rise,
                              span_xz):
    """lowest_ceiling_above on packed columns -> (bottom_y, found)."""
    words, in_range = _footprint_cols(cfg, cols, x0, x1, z0, z1, span_xz)
    iy_bot = axis_index(cfg, 1, top - BOUNDARY_EPS) + 1
    # ceiling bottom must lie below top + max_rise: y*vs + org < top + max_rise
    iy_hi = axis_index(cfg, 1, top + max_rise)
    ny = cfg.dims[1]
    iy0 = jnp.clip(iy_bot, 0, ny - 1)[..., None]
    iy1 = jnp.clip(iy_hi, -1, ny - 1)[..., None]
    big = jnp.int32(1 << 30)
    best = jnp.full(words.shape[:-1], big, jnp.int32)
    for w in range(words.shape[-1]):
        m = _range_mask(iy0, iy1, w)
        bits = words[..., w] & m
        lb = _lowest_bit(bits) + 32 * w
        best = jnp.where((bits != 0) & in_range, jnp.minimum(best, lb), best)
    best = jnp.min(best, axis=-1)
    found = best < big
    bot_y = cfg.origin[1] + best.astype(jnp.float32) * cfg.voxel_size
    ok = found & (bot_y < top + max_rise)
    return jnp.where(ok, bot_y, jnp.inf), ok


def _capsule_column_geom(cfg: GridConfig, cx, cz, radius, span_xz):
    """Per-column footprint geometry for a vertical capsule of `radius` at
    (cx, cz): gathered coordinates (ix, iz [..., S]), horizontal squared
    distance d2 from the axis to each column's nearest point, and the
    in-circle mask (d2 < radius^2). Used by the capsule floor/ceiling scans."""
    x0, x1 = cx - radius, cx + radius
    z0, z1 = cz - radius, cz + radius
    sx, sz = span_xz
    ix0 = axis_index(cfg, 0, x0 + BOUNDARY_EPS)
    ix1 = axis_index(cfg, 0, x1 - BOUNDARY_EPS)
    iz0 = axis_index(cfg, 2, z0 + BOUNDARY_EPS)
    iz1 = axis_index(cfg, 2, z1 - BOUNDARY_EPS)
    off = _offsets(sx, sz)
    ix = ix0[..., None] + off[..., 0]
    iz = iz0[..., None] + off[..., 1]
    in_range = (ix <= ix1[..., None]) & (iz <= iz1[..., None])
    vs = cfg.voxel_size
    clx = cfg.origin[0] + ix.astype(jnp.float32) * vs
    clz = cfg.origin[2] + iz.astype(jnp.float32) * vs
    dx = jnp.maximum(jnp.maximum(clx - cx[..., None],
                                 cx[..., None] - (clx + vs)), 0.0)
    dz = jnp.maximum(jnp.maximum(clz - cz[..., None],
                                 cz[..., None] - (clz + vs)), 0.0)
    d2 = dx * dx + dz * dz
    return ix, iz, d2, in_range


def cols_capsule_floor_below(cfg: GridConfig, cols, cx, cz, bottom, max_drop,
                             span_xz, radius: float,
                             max_slope_cos: float = 0.70710678):
    """Capsule-exact landing support on packed columns -> (support_y, found).

    The capsule's bottom SPHERE rests on a column's highest solid cell at
    support_y = cell_top - (r - sqrt(r^2 - d^2)), where d is the horizontal
    distance from the capsule axis to the column's nearest point — the dip
    Bullet's capsule-vs-box contact produces at box edges (golden trace
    ledge_fall: 2.3 cm at d = 0.12). Columns beyond d = r*sin(slope) cannot
    support at all: the contact normal tilts past the controller's 45-degree
    slope filter (KinematicClosestNotMeConvexResultCallback, kcc.cpp:52-93)
    and the reference's stepDown ignores the hit, letting the capsule slip
    off the edge. Columns under the axis (d = 0) reproduce the flat AABB
    answer bit-for-bit (dip = 0).

    The y-scan extends `radius` above `bottom` because a dipped rest sits
    BELOW its supporting cell's top; the per-column effective-support filter
    (support_y <= bottom + eps) restores exactness."""
    r = jnp.float32(radius)
    ix, iz, d2, in_range = _capsule_column_geom(cfg, cx, cz, radius, span_xz)
    words = _gather_cols(cfg, cols, ix, iz)
    dip = r - jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
    d_max = r * jnp.sqrt(jnp.maximum(1.0 - max_slope_cos * max_slope_cos, 0.0))
    can_support = in_range & (d2 <= d_max * d_max)

    iy_top = axis_index(cfg, 1, bottom + r + BOUNDARY_EPS) - 1
    iy_lo = axis_index(cfg, 1, bottom - max_drop) - 1
    ny = cfg.dims[1]
    iy0 = jnp.clip(iy_lo, 0, ny - 1)[..., None]
    iy1 = jnp.clip(iy_top, -1, ny - 1)[..., None]
    best = jnp.full(words.shape[:-1], -1, jnp.int32)   # [..., S]
    for w in range(words.shape[-1]):
        m = _range_mask(iy0, iy1, w)
        bits = words[..., w] & m
        hb = _highest_bit(bits) + 32 * w
        best = jnp.where((bits != 0) & can_support, jnp.maximum(best, hb), best)
    top_col = cfg.origin[1] + (best.astype(jnp.float32) + 1.0) * cfg.voxel_size
    eff = top_col - dip
    bot = bottom[..., None]
    ok_col = (best >= 0) & (eff <= bot + BOUNDARY_EPS) \
        & (eff >= bot - max_drop)
    eff = jnp.where(ok_col, eff, -jnp.inf)
    support = jnp.max(eff, axis=-1)
    found = jnp.isfinite(support)
    return jnp.where(found, support, -jnp.inf), found


def cols_capsule_ceiling_above(cfg: GridConfig, cols, cx, cz, top, max_rise,
                               span_xz, radius: float,
                               max_slope_cos: float = 0.70710678):
    """Capsule-exact ceiling blocking on packed columns -> (block_y, found).

    Mirror image of cols_capsule_floor_below for the TOP sphere: a column's
    lowest solid cell blocks the rise at block_y = cell_bottom + dip(d);
    columns past the 45-degree contact filter never block (stepUp's
    ceiling-filtered sweep, kcc.cpp:241-249)."""
    r = jnp.float32(radius)
    ix, iz, d2, in_range = _capsule_column_geom(cfg, cx, cz, radius, span_xz)
    words = _gather_cols(cfg, cols, ix, iz)
    dip = r - jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
    d_max = r * jnp.sqrt(jnp.maximum(1.0 - max_slope_cos * max_slope_cos, 0.0))
    can_block = in_range & (d2 <= d_max * d_max)

    iy_bot = axis_index(cfg, 1, top - r - BOUNDARY_EPS) + 1
    iy_hi = axis_index(cfg, 1, top + max_rise)
    ny = cfg.dims[1]
    iy0 = jnp.clip(iy_bot, 0, ny - 1)[..., None]
    iy1 = jnp.clip(iy_hi, -1, ny - 1)[..., None]
    big = jnp.int32(1 << 30)
    best = jnp.full(words.shape[:-1], big, jnp.int32)
    for w in range(words.shape[-1]):
        m = _range_mask(iy0, iy1, w)
        bits = words[..., w] & m
        lb = _lowest_bit(bits) + 32 * w
        best = jnp.where((bits != 0) & can_block, jnp.minimum(best, lb), best)
    bot_col = cfg.origin[1] + best.astype(jnp.float32) * cfg.voxel_size
    eff = bot_col + dip
    topx = top[..., None]
    ok_col = (best < big) & (eff >= topx - BOUNDARY_EPS) \
        & (eff < topx + max_rise)
    eff = jnp.where(ok_col, eff, jnp.inf)
    block = jnp.min(eff, axis=-1)
    found = jnp.isfinite(block)
    return jnp.where(found, block, jnp.inf), found


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
