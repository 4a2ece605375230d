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
