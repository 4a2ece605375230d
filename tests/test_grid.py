"""Voxel grid query semantics (counterpart of ref voxel_grid_tests.cpp)."""

import jax.numpy as jnp
import numpy as np

import megaverse_tpu.constants as C
from megaverse_tpu.ops import grid as G
from megaverse_tpu.types import GridConfig

CFG = GridConfig(dims=(16, 8, 16), voxel_size=1.0, origin=(-4.0, -2.0, -4.0))


def make_vtype():
    v = np.zeros(CFG.dims, np.uint8)
    # floor at world y in [-1, 0): voxel row y=1
    v[:, 1, :] = C.VOXEL_SOLID | C.VOXEL_OPAQUE
    # wall at world x in [3, 4): voxel x=7, above floor rows 2..5
    v[7, 2:6, :] = C.VOXEL_SOLID | C.VOXEL_OPAQUE
    return jnp.asarray(v)


def test_world_to_voxel():
    ii = G.world_to_voxel(CFG, jnp.array([0.0, 0.0, 0.0]))
    assert tuple(np.asarray(ii)) == (4, 2, 4)
    ii = G.world_to_voxel(CFG, jnp.array([-3.5, -1.5, 3.99]))
    assert tuple(np.asarray(ii)) == (0, 0, 7)


def test_aabb_hits_solid():
    v = make_vtype()
    # Box resting exactly on the floor (bottom at y=0) does not hit it.
    lo = jnp.array([[0.0, 0.0, 0.0]])
    hi = jnp.array([[0.6, 1.7, 0.6]])
    hit = G.aabb_hits_solid(CFG, v, lo, hi, (2, 3, 2))
    assert not bool(hit[0])
    # Penetrating the floor hits.
    lo2 = lo.at[0, 1].add(-0.01)
    hit = G.aabb_hits_solid(CFG, v, lo2, hi, (2, 3, 2))
    assert bool(hit[0])
    # Touching the wall plane exactly does not hit; crossing does.
    lo3 = jnp.array([[2.4, 0.0, 0.0]])
    hi3 = jnp.array([[3.0, 1.7, 0.6]])
    assert not bool(G.aabb_hits_solid(CFG, v, lo3, hi3, (2, 3, 2))[0])
    hi4 = hi3.at[0, 0].add(0.01)
    assert bool(G.aabb_hits_solid(CFG, v, lo3, hi4, (2, 3, 2))[0])


def test_floor_scan():
    v = make_vtype()
    top, found = G.highest_floor_below(
        CFG, v,
        jnp.array([0.0]), jnp.array([0.6]), jnp.array([0.0]), jnp.array([0.6]),
        bottom=jnp.array([2.5]), max_drop=4.0, span_xz=(2, 2),
    )
    assert bool(found[0])
    assert np.isclose(float(top[0]), 0.0)  # floor top at world y=0


def test_ceiling_scan():
    v = make_vtype()
    v = v.at[:, 6, :].set(C.VOXEL_SOLID)  # ceiling at world y in [4, 5)
    bot, found = G.lowest_ceiling_above(
        CFG, v,
        jnp.array([0.0]), jnp.array([0.6]), jnp.array([0.0]), jnp.array([0.6]),
        top=jnp.array([1.7]), max_rise=6.0, span_xz=(2, 2),
    )
    assert bool(found[0])
    assert np.isclose(float(bot[0]), 4.0)


def test_oob_is_empty():
    v = make_vtype()
    hit = G.aabb_hits_solid(
        CFG, v, jnp.array([[100.0, 0.0, 0.0]]), jnp.array([[100.6, 1.7, 0.6]]), (2, 3, 2)
    )
    assert not bool(hit[0])


def test_packed_columns_match_generic_queries():
    """cols_* queries are drop-in equivalents of the generic 3-D-gather
    versions (same BOUNDARY_EPS rounding, same results) on random worlds."""
    import numpy as np
    from megaverse_tpu.types import GridConfig

    rng = np.random.default_rng(0)
    cfg = GridConfig(dims=(12, 40, 12), voxel_size=1.0, origin=(-2.0, -3.0, -2.0))
    vt = (rng.random((12, 40, 12)) < 0.15).astype(np.uint8) * C.VOXEL_SOLID
    vt = jnp.asarray(vt)
    cols = G.pack_solid_columns(cfg, vt)

    n = 256
    pos = rng.uniform(-3, 11, size=(n, 3)).astype(np.float32)
    # y restricted so query windows stay inside the grid: outside it the
    # generic version truncates the search to a fixed cell window while the
    # packed version searches the exact [start, start+range] interval (the
    # packed behavior is the correct one; physics keeps agents in-grid).
    pos[:, 1] = rng.uniform(-1, 33, size=n)
    he = np.array([0.33, 0.855, 0.33], np.float32)
    lo = jnp.asarray(pos - he)
    hi = jnp.asarray(pos + he)

    a = G.aabb_hits_solid(cfg, vt, lo, hi, (2, 3, 2))
    b = G.cols_aabb_hits_solid(cfg, cols, lo, hi, (2, 2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x0, x1 = lo[:, 0], hi[:, 0]
    z0, z1 = lo[:, 2], hi[:, 2]
    bottom = lo[:, 1]
    fy1, ff1 = G.highest_floor_below(cfg, vt, x0, x1, z0, z1, bottom, 4.0, (2, 2))
    fy2, ff2 = G.cols_highest_floor_below(cfg, cols, x0, x1, z0, z1, bottom, 4.0, (2, 2))
    np.testing.assert_array_equal(np.asarray(ff1), np.asarray(ff2))
    np.testing.assert_array_equal(np.asarray(fy1)[np.asarray(ff1)],
                                  np.asarray(fy2)[np.asarray(ff2)])

    top = hi[:, 1]
    cy1, cf1 = G.lowest_ceiling_above(cfg, vt, x0, x1, z0, z1, top, 2.0, (2, 2))
    cy2, cf2 = G.cols_lowest_ceiling_above(cfg, cols, x0, x1, z0, z1, top, 2.0, (2, 2))
    np.testing.assert_array_equal(np.asarray(cf1), np.asarray(cf2))
    np.testing.assert_array_equal(np.asarray(cy1)[np.asarray(cf1)],
                                  np.asarray(cy2)[np.asarray(cf2)])


def test_cols_update_and_query_match_dense():
    """solid_from_cols == (gather_voxel & SOLID) != 0, and update_cols on the
    packed grid == set_voxel on the dense grid followed by a re-pack — the
    invariant that lets EnvState carry ONLY the packed columns."""
    rng = np.random.default_rng(3)
    vt = (rng.random(CFG.dims) < 0.3).astype(np.uint8) * C.VOXEL_SOLID
    vt |= (rng.random(CFG.dims) < 0.2).astype(np.uint8) * C.VOXEL_OPAQUE
    vt = jnp.asarray(vt)
    cols = G.pack_solid_columns(CFG, vt)
    # host twin is bit-identical
    np.testing.assert_array_equal(
        np.asarray(cols), G.pack_solid_columns_np(np.asarray(vt)))

    # distinct cells, distinct even after set_voxel's OOB clipping (an OOB
    # row clipping onto a written cell makes the DENSE reference scatter
    # racy, not the packed path), plus fully-masked rows
    raw = np.unique(rng.integers(-2, 18, size=(96, 3)), axis=0)
    clipped = np.clip(raw, 0, np.asarray(CFG.dims) - 1)
    _, first = np.unique(clipped, axis=0, return_index=True)
    ii = jnp.asarray(np.concatenate(
        [raw[np.sort(first)], np.full((4, 3), -1)]), jnp.int32)
    want = (G.gather_voxel(CFG, vt, ii) & C.VOXEL_SOLID) != 0
    np.testing.assert_array_equal(np.asarray(G.solid_from_cols(CFG, cols, ii)),
                                  np.asarray(want))

    for solid in (True, False):
        flag = jnp.uint8(C.VOXEL_SOLID if solid else 0)
        vt2 = G.set_voxel(
            CFG, vt, ii,
            (G.gather_voxel(CFG, vt, ii) & ~jnp.uint8(C.VOXEL_SOLID)) | flag)
        cols2 = G.update_cols(CFG, cols, ii, solid)
        np.testing.assert_array_equal(np.asarray(cols2),
                                      np.asarray(G.pack_solid_columns(CFG, vt2)))
    # masked coords (-1) are dropped
    cols3 = G.update_cols(CFG, cols, jnp.full((4, 3), -1, jnp.int32), True)
    np.testing.assert_array_equal(np.asarray(cols3), np.asarray(cols))


def test_cols_update_same_word_different_bits():
    """Two updates landing in the SAME packed word (one xz column, two
    heights) must both apply — the scatter-order race a read-modify-write
    scatter would introduce."""
    cols = G.pack_solid_columns(CFG, jnp.zeros(CFG.dims, jnp.uint8))
    ii = jnp.asarray([[3, 2, 5], [3, 6, 5]], jnp.int32)
    cols2 = G.update_cols(CFG, cols, ii, True)
    assert int(cols2[3, 0, 5]) == (1 << 2) | (1 << 6)
    cols3 = G.update_cols(CFG, cols2, ii[:1], False)
    assert int(cols3[3, 0, 5]) == (1 << 6)


def test_capsule_floor_edge_dip_and_slip():
    """cols_capsule_floor_below: support under the axis equals the cell top
    exactly; at horizontal distance d from a ledge edge the support dips by
    r - sqrt(r^2 - d^2); past d = r*sin(45deg) the contact normal fails the
    controller's slope filter and there is NO support (the capsule slips
    off) — the behavior that makes the ledge_fall golden trace bit-exact."""
    r = 0.33
    cfg = GridConfig(dims=(16, 8, 16), voxel_size=1.0, origin=(-8.0, -2.0, -8.0))
    vt = np.zeros(cfg.dims, np.uint8)
    vt[:, 1, :8] = C.VOXEL_SOLID          # floor top y=0 for z < 0
    cols = G.pack_solid_columns(cfg, jnp.asarray(vt))

    def support(cx, cz, bottom=0.0):
        y, f = G.cols_capsule_floor_below(
            cfg, cols, jnp.asarray([cx], jnp.float32),
            jnp.asarray([cz], jnp.float32),
            jnp.asarray([bottom], jnp.float32), 4.0, (2, 2), r)
        return (float(y[0]), bool(f[0]))

    # axis over the floor: exact cell top
    y, f = support(0.5, -2.0)
    assert f and y == 0.0
    # axis 0.12 past the edge (z = 0): dip = r - sqrt(r^2 - 0.12^2)
    d = 0.12
    y, f = support(0.5, d)
    assert f
    np.testing.assert_allclose(y, -(r - np.sqrt(r * r - d * d)), atol=1e-6)
    # past the 45-degree filter: no support at all
    y, f = support(0.5, r * np.sin(np.pi / 4) + 0.01)
    assert not f
    # ...even though the bounding SQUARE still overlaps the floor there
    assert r * np.sin(np.pi / 4) + 0.01 < r


def test_capsule_ceiling_edge_dip():
    """cols_capsule_ceiling_above mirrors the floor scan for the top
    sphere: blocking height rises by the dip at the slab edge."""
    r = 0.33
    cfg = GridConfig(dims=(16, 8, 16), voxel_size=1.0, origin=(-8.0, -2.0, -8.0))
    vt = np.zeros(cfg.dims, np.uint8)
    vt[:, 5, :8] = C.VOXEL_SOLID          # slab bottom at y=3 for z < 0
    cols = G.pack_solid_columns(cfg, jnp.asarray(vt))

    def block(cx, cz, top=2.0):
        y, f = G.cols_capsule_ceiling_above(
            cfg, cols, jnp.asarray([cx], jnp.float32),
            jnp.asarray([cz], jnp.float32),
            jnp.asarray([top], jnp.float32), 4.0, (2, 2), r)
        return (float(y[0]), bool(f[0]))

    y, f = block(0.5, -2.0)
    assert f and y == 3.0
    d = 0.15
    y, f = block(0.5, d)
    assert f
    np.testing.assert_allclose(y, 3.0 + (r - np.sqrt(r * r - d * d)), atol=1e-6)
    y, f = block(0.5, r * np.sin(np.pi / 4) + 0.01)
    assert not f


def test_first_free_above_matches_loop():
    """first_free_above is bit-exact vs the sequential climb loop it
    replaced in fall_detection_step (component_fall_detection.hpp:49-56):
    fuzz random columns + starts incl. out-of-bounds and all-solid runs."""
    rng = np.random.default_rng(7)
    cfg = GridConfig(dims=(12, 40, 12), voxel_size=1.0, origin=(0.0, 0.0, 0.0))
    vt = (rng.random(cfg.dims) < 0.45).astype(np.uint8) * C.VOXEL_SOLID
    vt[3, :, 4] = C.VOXEL_SOLID                   # one all-solid column
    cols = G.pack_solid_columns(cfg, jnp.asarray(vt))

    n = 256
    ii = np.stack([rng.integers(-2, 14, n), rng.integers(-2, 44, n),
                   rng.integers(-2, 14, n)], axis=-1).astype(np.int32)
    for max_scan in (1, 7, 16, 32):
        voxel = jnp.asarray(ii)
        for _ in range(max_scan):
            occupied = G.solid_from_cols(cfg, cols, voxel)
            voxel = jnp.where(occupied[:, None],
                              voxel + jnp.asarray([0, 1, 0]), voxel)
        fast = G.first_free_above(cfg, cols, jnp.asarray(ii), max_scan)
        np.testing.assert_array_equal(np.asarray(voxel), np.asarray(fast))
