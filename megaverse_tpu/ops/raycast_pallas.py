"""Pallas TPU kernel for the analytic raycasting renderer.

The XLA renderer (ops/raycast.py) unrolls the primitive loop at trace time,
which is fast for small scenes but makes compile time linear in primitive
count (Collect scenes reach ~1000 primitives). This kernel keeps the loop
ROLLED: each program instance renders an 8x128 pixel tile (one VPU register
tile) of one agent's view, walking a unified per-env primitive table with the
closest-hit carry held in registers. Every table access is a dynamic scalar
load broadcast against the tile, so tables live in SMEM (scalar memory) when
they fit — a VMEM scalar read stalls on a vector access. Branching on the
primitive type happens on a scalar, so only one intersection routine executes
per table row; clusters whose live rows are all AABBs take a branch-free fast
path.

Culling pipeline (all bit-exact, see tests/test_render.py):
  1. build_clusters groups rows into CLUSTER_K-row clusters w/ AABBs + tags;
  2. frustum_cull (XLA) builds per-(env, agent, tile) front-to-back cluster
     lists via conservative interval slab tests — clusters outside a tile's
     view get distance +INF and sort last;
  3. the kernel walks the list, slab-testing each cluster against the tile's
     current closest-hit depths (occlusion), and TERMINATES when every ray's
     hit is strictly nearer than the next cluster's distance bound (the tile
     max depth rides the loop as a scalar, refreshed only when rows run).

Unified primitive row (12 f32):
  [0]     type: 0=aabb, 1=ellipsoid, 2=cylinder-y, 3=cone-y, 4=cone-y flipped,
          5=yaw/pitch-rotated eye box, 6=y-rotated box, <0 = unused slot
  [1:4]   a: box lo / center / camera pos
  [4:7]   b: box hi / radii / (rx, rz, half_h) / (yaw, pitch, -)
  [7]     rgb albedo packed as float((r8<<16)|(g8<<8)|b8) — palette entries
          are exactly k/255 and f32(k)/255 reproduces them bit-exactly, so
          the closest-hit loop carries ONE channel and unpacks once per tile
  [8:11]  c: rotated-box half extents (type 6)
Camera row (8 f32): eye xyz, yaw, pitch, time_fraction.

Output: packed RGB in int32 [B, A, H, W] (unpacked to uint8 by the caller).

Geometry/shading semantics identical to ops/raycast.py (see its docstring for
reference citations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from megaverse_tpu import constants as C
from megaverse_tpu.ops.raycast import pow_shininess
from megaverse_tpu.types import AgentState, EnvConfig, PropState, PROP_FLAG_VISIBLE

INF = 1e30
TILE_H = 8
TILE_W = 128

# Cluster culling: prim-table rows are grouped into clusters of CLUSTER_K
# consecutive rows with a conservative cluster AABB. Per 8x128 ray tile the
# kernel slab-tests the cluster AABB (also against the tile's current
# closest-hit depths — occlusion pruning) and skips all K intersection
# routines when no ray can produce a closer hit. The analogue of the tile
# binning a GPU rasterizer gets from its hardware scan converter; on heavy
# scenes (Collect terrain ~500 rows) most clusters miss most tiles.
# K=8 (was 4): fusing each hex wall with its bottom edging halved the
# dominant row population of hex scenes, so the same spatial neighborhood
# now fits in half the rows — coarser clusters amortize the per-cluster
# scalar work (bit loads, tag switch) without losing AABB tightness.
CLUSTER_K = 8
# Clusters per SUPERcluster (second culling level): the per-tile sorted lists
# (and the XLA sort building them — strongly superlinear in list length on
# TPU) shrink by this factor; the kernel prunes SUPER_K*CLUSTER_K rows with
# one vector slab test.
SUPER_K = 4
# Conservative bound radius of the eye box: |offset| + |half extents|
# (0.19 + 0.342) — valid for every yaw/pitch.
_EYE_BOUND = 0.54

# Prim tables up to this size live in SMEM (every access is a dynamic scalar
# load; VMEM scalar reads stall). SMEM is 1 MB on v5e and pads the MINOR
# dimension of each window to 1 KB, so tables ship FLATTENED to 1D per env
# (one padding, not one per row). Budget: this x2 buffering + cluster/order/
# dist blocks must stay under 1 MB.
PRIM_SMEM_LIMIT_BYTES = 256 * 1024

ROW_W = 12  # f32 stride of one primitive-table row

PRIM_AABB = 0
PRIM_ELLIPSOID = 1
PRIM_CYLINDER = 2
PRIM_CONE = 3
PRIM_CONE_FLIPPED = 4
PRIM_EYEBOX = 5
PRIM_ROTBOX = 6  # y-rotated box: a=center, b=(yaw,-,-), c=half extents
# Fused hex wall + bottom edging: a=center, b=(yaw, cos, sin), c=wall half
# extents, col 7 = wall packed RGB, col 11 = edging packed RGB. The edging
# box is derived in-kernel (C.WALL_EDGE_*) and shares the wall's rotated-ray
# products — one row renders what used to take two.
PRIM_ROTBOX_WALL = 7
TAG_CONE_MIXED = 8  # cluster tag: live rows are CONE / CONE_FLIPPED mixed
                    # (diamonds interleave top+bottom cones)

_EYE_HALF = (0.25, 0.12, 0.2)
_EYE_OFFSET = (0.0, 0.0, -0.19)


def _render_kernel(cam_ref, prims_ref, *rest, height, width, num_prims,
                   cluster_k=0, sorted_order=False, early_exit=False,
                   per_tile=False, prim_flat=False, ui_indicators=False,
                   super_k=0, num_clusters=0, merge_tiles=False,
                   bit_walk=False):
    if bit_walk:
        # compact survivor lists + packed member bitmasks (cull_bits);
        # scalar-only control flow, front-to-back with a lazily-refreshed
        # depth bound
        (clusters_ref, sclist_ref, clbits_ref, scdist_ref, cdist_ref,
         out_ref) = rest
    elif super_k:
        # supercluster mode implies sorted per-tile lists + early exit
        clusters_ref, sclusters_ref, order_ref, dist_ref, out_ref = rest
    elif cluster_k and sorted_order and early_exit:
        clusters_ref, order_ref, dist_ref, out_ref = rest
    elif cluster_k and sorted_order:
        clusters_ref, order_ref, out_ref = rest
    elif cluster_k:
        clusters_ref, out_ref = rest
    else:
        (out_ref,) = rest
    # ---- camera scalars ----
    agent = pl.program_id(1)
    ex = cam_ref[0, agent, 0]
    ey = cam_ref[0, agent, 1]
    ez = cam_ref[0, agent, 2]
    yaw = cam_ref[0, agent, 3]
    pitch = cam_ref[0, agent, 4]
    time_frac = cam_ref[0, agent, 5]



    # Table loads: SMEM tables arrive FLATTENED to 1D (SMEM pads each
    # window's minor dim to 1 KB — a [M, 12] block would burn 1 KB per row).
    if prim_flat:
        pload = lambda i, c: prims_ref[0, 0, i * ROW_W + c]
    else:
        pload = lambda i, c: prims_ref[0, i, c]
    if cluster_k:
        cload = lambda g, c: clusters_ref[0, 0, g * 8 + c]
    if super_k:
        scload = lambda g, c: sclusters_ref[0, 0, g * 8 + c]

    # Per-tile render body; `merge_tiles` loops it over all tile
    # rows inside ONE program per (env, agent) — amortizing the
    # program setup/DMA overhead of the 3D grid.
    def _tile(tile_row):
        tan_h = np.tan(np.deg2rad(C.CAMERA_FOV_DEG / 2)).astype(np.float32)
        tan_v = np.float32(tan_h * height / width)

        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
        rowf = rows + tile_row * TILE_H
        u = ((cols + 0.5) / width * 2.0 - 1.0) * tan_h
        v = (1.0 - (rowf + 0.5) / height * 2.0) * tan_v
        inv_len = jax.lax.rsqrt(u * u + v * v + 1.0)
        dx0 = u * inv_len
        dy0 = v * inv_len
        dz0 = -inv_len

        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        cp, sp = jnp.cos(pitch), jnp.sin(pitch)
        y1 = cp * dy0 - sp * dz0
        z1 = sp * dy0 + cp * dz0
        dx = cy * dx0 + sy * z1
        dy = y1
        dz = -sy * dx0 + cy * z1

        eps = 1e-12
        ix = 1.0 / jnp.where(jnp.abs(dx) < eps, eps, dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < eps, eps, dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < eps, eps, dz)

        near = np.float32(C.CAMERA_NEAR)

        # ---- intersection routines (share the ray tile via closure) ----
        # Slab tests take the hoisted o*i products (ox·rix etc. computed once per
        # ray frame, not per row) — mirrors ops/raycast.py box_hit exactly so the
        # backends stay arithmetically identical.
        def aabb(lox, loy, loz, hix, hiy, hiz, oxix, oyiy, oziz,
                 rdx, rdy, rdz, rix, riy, riz):
            t1x = lox * rix - oxix
            t2x = hix * rix - oxix
            t1y = loy * riy - oyiy
            t2y = hiy * riy - oyiy
            t1z = loz * riz - oziz
            t2z = hiz * riz - oziz
            tminx = jnp.minimum(t1x, t2x)
            tminy = jnp.minimum(t1y, t2y)
            tminz = jnp.minimum(t1z, t2z)
            tmin = jnp.maximum(tminx, jnp.maximum(tminy, tminz))
            tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                               jnp.minimum(jnp.maximum(t1y, t2y), jnp.maximum(t1z, t2z)))
            hit = (tmax >= tmin) & (tmin > near)
            t = jnp.where(hit, tmin, INF)
            is_x = tmin == tminx
            is_y = (~is_x) & (tmin == tminy)
            nx = jnp.where(is_x, -jnp.sign(rdx), 0.0)
            ny = jnp.where(is_y, -jnp.sign(rdy), 0.0)
            nz = jnp.where(is_x | is_y, 0.0, -jnp.sign(rdz))
            return t, nx, ny, nz

        exix = ex * ix
        eyiy = ey * iy
        eziz = ez * iz

        def prim_aabb(a0, a1, a2, b0, b1, b2):
            return aabb(a0, a1, a2, b0, b1, b2, exix, eyiy, eziz,
                        dx, dy, dz, ix, iy, iz)

        def prim_ellipsoid(cx0, cy0, cz0, rx, ry, rz):
            irx, iry, irz = 1.0 / rx, 1.0 / ry, 1.0 / rz
            qx = (ex - cx0) * irx
            qy = (ey - cy0) * iry
            qz = (ez - cz0) * irz
            ddx = dx * irx
            ddy = dy * iry
            ddz = dz * irz
            a = ddx * ddx + ddy * ddy + ddz * ddz
            b = qx * ddx + qy * ddy + qz * ddz
            c0 = qx * qx + qy * qy + qz * qz - 1.0
            disc = b * b - a * c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t = (-b - sq) / jnp.maximum(a, 1e-12)
            hit = (disc > 0) & (t > near)
            t = jnp.where(hit, t, INF)
            nx = (ex + t * dx - cx0) * irx * irx
            ny = (ey + t * dy - cy0) * iry * iry
            nz = (ez + t * dz - cz0) * irz * irz
            inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-18)
            return t, nx * inv, ny * inv, nz * inv

        def prim_cylinder(cx0, cy0, cz0, rx, rz, half_h):
            qx = (ex - cx0) / rx
            qz = (ez - cz0) / rz
            ddx = dx / rx
            ddz = dz / rz
            a = ddx * ddx + ddz * ddz
            b = qx * ddx + qz * ddz
            c0 = qx * qx + qz * qz - 1.0
            disc = b * b - a * c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_side = (-b - sq) / jnp.maximum(a, 1e-12)
            y_side = ey + t_side * dy - cy0
            side_ok = (disc > 0) & (t_side > near) & (jnp.abs(y_side) <= half_h)
            t_side = jnp.where(side_ok, t_side, INF)

            sign = -jnp.sign(dy)
            cap_y = cy0 + sign * half_h
            t_cap = (cap_y - ey) * iy
            px = (ex + t_cap * dx - cx0) / rx
            pz = (ez + t_cap * dz - cz0) / rz
            cap_ok = (t_cap > near) & (px * px + pz * pz <= 1.0)
            t_cap = jnp.where(cap_ok, t_cap, INF)

            use_cap = t_cap < t_side
            t = jnp.minimum(t_side, t_cap)
            snx = (ex + t * dx - cx0) / (rx * rx)
            snz = (ez + t * dz - cz0) / (rz * rz)
            inv = jax.lax.rsqrt(snx * snx + snz * snz + 1e-18)
            nx = jnp.where(use_cap, 0.0, snx * inv)
            ny = jnp.where(use_cap, sign, 0.0)
            nz = jnp.where(use_cap, 0.0, snz * inv)
            return t, nx, ny, nz

        def prim_cone(cx0, cy0, cz0, rx, rz, half_h, s):
            apex_y = cy0 + s * half_h
            qx = (ex - cx0) / rx
            qz = (ez - cz0) / rz
            qy = (ey - apex_y) * s
            ddx = dx / rx
            ddz = dz / rz
            ddy = dy * s
            k = 1.0 / (2.0 * half_h)
            a = ddx * ddx + ddz * ddz - (k * ddy) ** 2
            b = qx * ddx + qz * ddz - k * k * qy * ddy
            c0 = qx * qx + qz * qz - (k * qy) ** 2
            disc = b * b - a * c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            asafe = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
            t1 = (-b - sq) / asafe
            t2 = (-b + sq) / asafe

            def ok(t):
                yy = qy + t * ddy
                return (disc > 0) & (t > near) & (yy <= 0) & (yy >= -2.0 * half_h)

            t_side = jnp.where(ok(t1), t1, jnp.where(ok(t2), t2, INF))

            base_y = apex_y - s * 2.0 * half_h
            t_cap = (base_y - ey) * iy
            px = (ex + t_cap * dx - cx0) / rx
            pz = (ez + t_cap * dz - cz0) / rz
            cap_ok = (t_cap > near) & (px * px + pz * pz <= 1.0)
            t_cap = jnp.where(cap_ok, t_cap, INF)

            use_cap = t_cap < t_side
            t = jnp.minimum(t_side, t_cap)
            relx = ex + t * dx - cx0
            rely = ey + t * dy - apex_y
            relz = ez + t * dz - cz0
            snx = relx / (rx * rx)
            sny = -(k * k) * rely
            snz = relz / (rz * rz)
            inv = jax.lax.rsqrt(snx * snx + sny * sny + snz * snz + 1e-18)
            nx = jnp.where(use_cap, 0.0, snx * inv)
            ny = jnp.where(use_cap, -s, sny * inv)
            nz = jnp.where(use_cap, 0.0, snz * inv)
            return t, nx, ny, nz

        def prim_eyebox(cx0, cy0, cz0, byaw, bpitch):
            cyj, syj = jnp.cos(byaw), jnp.sin(byaw)
            cpj, spj = jnp.cos(bpitch), jnp.sin(bpitch)
            ox, oy, oz = ex - cx0, ey - cy0, ez - cz0
            lx = cyj * ox - syj * oz
            lz1 = syj * ox + cyj * oz
            ly = cpj * oy + spj * lz1
            lz = -spj * oy + cpj * lz1
            dlx = cyj * dx - syj * dz
            dlz1 = syj * dx + cyj * dz
            dly = cpj * dy + spj * dlz1
            dlz = -spj * dy + cpj * dlz1
            eps2 = 1e-12
            rix = 1.0 / jnp.where(jnp.abs(dlx) < eps2, eps2, dlx)
            riy = 1.0 / jnp.where(jnp.abs(dly) < eps2, eps2, dly)
            riz = 1.0 / jnp.where(jnp.abs(dlz) < eps2, eps2, dlz)
            t, nlx, nly, nlz = aabb(
                _EYE_OFFSET[0] - _EYE_HALF[0], _EYE_OFFSET[1] - _EYE_HALF[1], _EYE_OFFSET[2] - _EYE_HALF[2],
                _EYE_OFFSET[0] + _EYE_HALF[0], _EYE_OFFSET[1] + _EYE_HALF[1], _EYE_OFFSET[2] + _EYE_HALF[2],
                lx * rix, ly * riy, lz * riz, dlx, dly, dlz, rix, riy, riz,
            )
            wy = cpj * nly - spj * nlz
            wz1 = spj * nly + cpj * nlz
            wx = cyj * nlx + syj * wz1
            wz = -syj * nlx + cyj * wz1
            return t, wx, wy, wz

        def prim_rotbox(cx0, cy0, cz0, cyj, syj, hx, hy, hz):
            # cyj/syj are the row's precomputed cos/sin (table cols 5/6)
            ox, oy, oz = ex - cx0, ey - cy0, ez - cz0
            lx = cyj * ox - syj * oz
            lz = syj * ox + cyj * oz
            dlx = cyj * dx - syj * dz
            dlz = syj * dx + cyj * dz
            eps2 = 1e-12
            rix = 1.0 / jnp.where(jnp.abs(dlx) < eps2, eps2, dlx)
            riz = 1.0 / jnp.where(jnp.abs(dlz) < eps2, eps2, dlz)
            t, nlx, nly, nlz = aabb(
                -hx, -hy, -hz, hx, hy, hz,
                lx * rix, oy * iy, lz * riz, dlx, dy, dlz, rix, iy, riz,
            )
            wx = cyj * nlx + syj * nlz
            wz = -syj * nlx + cyj * nlz
            return t, wx, nly, wz

        def prim_rotbox_wall(cx0, cy0, cz0, cyj, syj, hx, hy, hz, wcol, ecol):
            # Fused wall + bottom edging (scenarios/hex.py build_maze): the
            # rotated-ray products are computed ONCE and feed two slab tests.
            # The edging was drawn AFTER the wall, so it wins only on a
            # strictly closer hit — matching the old two-row in-order carry.
            ox, oy, oz = ex - cx0, ey - cy0, ez - cz0
            lx = cyj * ox - syj * oz
            lz = syj * ox + cyj * oz
            dlx = cyj * dx - syj * dz
            dlz = syj * dx + cyj * dz
            eps2 = 1e-12
            rix = 1.0 / jnp.where(jnp.abs(dlx) < eps2, eps2, dlx)
            riz = 1.0 / jnp.where(jnp.abs(dlz) < eps2, eps2, dlz)
            oxix_l = lx * rix
            oyiy_l = oy * iy
            oziz_l = lz * riz
            tw, nlx, nly, nlz = aabb(
                -hx, -hy, -hz, hx, hy, hz,
                oxix_l, oyiy_l, oziz_l, dlx, dy, dlz, rix, iy, riz)
            ehx = np.float32(C.WALL_EDGE_LEN_SCALE) * hx
            ehz = jnp.float32(C.WALL_EDGE_HZ)
            # edging world-y span is [0, 2*h_frac*hy]; bounds are expressed
            # relative to the WALL center cy0 so the local frame is shared
            te, elx, ely, elz = aabb(
                -ehx, -cy0, -ehz,
                ehx, np.float32(2.0 * C.WALL_EDGE_H_FRAC) * hy - cy0, ehz,
                oxix_l, oyiy_l, oziz_l, dlx, dy, dlz, rix, iy, riz)
            use_e = te < tw
            t = jnp.where(use_e, te, tw)
            nlx = jnp.where(use_e, elx, nlx)
            nly = jnp.where(use_e, ely, nly)
            nlz = jnp.where(use_e, elz, nlz)
            c = jnp.where(use_e, ecol, wcol)
            wx = cyj * nlx + syj * nlz
            wz = -syj * nlx + cyj * nlz
            return t, wx, nly, wz, c

        # ---- primitive loop ----
        def row_hit(i):
            # Generic (mixed-cluster) path; returns (t, nx, ny, nz, c) where
            # c is the packed hit color as a TILE plane — scalar for every
            # type except ROTBOX_WALL, whose color is per-pixel.
            ptype = pload(i, 0).astype(jnp.int32)
            a0 = pload(i, 1)
            a1 = pload(i, 2)
            a2 = pload(i, 3)
            b0 = pload(i, 4)
            b1 = pload(i, 5)
            b2 = pload(i, 6)
            c0_ = pload(i, 8)
            c1_ = pload(i, 9)
            c2_ = pload(i, 10)
            col = pload(i, 7)

            def plain(fn):
                def wrapped():
                    t, nx, ny, nz = fn()
                    return t, nx, ny, nz, zero + col
                return wrapped

            t, nx, ny, nz, c = jax.lax.switch(
                jnp.clip(ptype, 0, 7),
                [
                    plain(lambda: prim_aabb(a0, a1, a2, b0, b1, b2)),
                    plain(lambda: prim_ellipsoid(a0, a1, a2, b0, b1, b2)),
                    plain(lambda: prim_cylinder(a0, a1, a2, b0, b1, b2)),
                    plain(lambda: prim_cone(a0, a1, a2, b0, b1, b2,
                                            jnp.float32(1.0))),
                    plain(lambda: prim_cone(a0, a1, a2, b0, b1, b2,
                                            jnp.float32(-1.0))),
                    plain(lambda: prim_eyebox(a0, a1, a2, b0, b1)),
                    plain(lambda: prim_rotbox(a0, a1, a2, b1, b2,
                                              c0_, c1_, c2_)),
                    lambda: prim_rotbox_wall(a0, a1, a2, b1, b2,
                                             c0_, c1_, c2_, col, pload(i, 11)),
                ],
            )
            return jnp.where(ptype >= 0, t, INF), nx, ny, nz, c

        def row_hit_aabb(i):
            # Branch-free DEFERRED-NORMAL variant for clusters whose live rows are
            # all AABBs (merged layout boxes — the dominant row population): the
            # slab test returns (t, face-axis code) and the normal never enters
            # the loop carry — it is reconstructed ONCE per tile after the loop as
            # -sign(d) on the coded axis, the exact expression the inline path
            # evaluates per row, so the image is bit-identical while each row
            # saves the 3-component normal computation and its carry selects.
            live = pload(i, 0) >= 0
            lox, loy, loz = pload(i, 1), pload(i, 2), pload(i, 3)
            hix, hiy, hiz = pload(i, 4), pload(i, 5), pload(i, 6)
            t1x = lox * ix - exix
            t2x = hix * ix - exix
            t1y = loy * iy - eyiy
            t2y = hiy * iy - eyiy
            t1z = loz * iz - eziz
            t2z = hiz * iz - eziz
            tminx = jnp.minimum(t1x, t2x)
            tminy = jnp.minimum(t1y, t2y)
            tminz = jnp.minimum(t1z, t2z)
            tmin = jnp.maximum(tminx, jnp.maximum(tminy, tminz))
            tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                               jnp.minimum(jnp.maximum(t1y, t2y),
                                           jnp.maximum(t1z, t2z)))
            hit = (tmax >= tmin) & (tmin > near) & live
            t = jnp.where(hit, tmin, INF)
            code = jnp.where(tmin == tminx, jnp.int32(0),
                             jnp.where(tmin == tminy, jnp.int32(1), jnp.int32(2)))
            return t, code

        def row_hit_rotbox(i):
            # branch-free variant for all-ROTBOX clusters (maze landmarks)
            live = pload(i, 0) >= 0
            t, nx, ny, nz = prim_rotbox(
                pload(i, 1), pload(i, 2), pload(i, 3),
                pload(i, 5), pload(i, 6),
                pload(i, 8), pload(i, 9), pload(i, 10))
            return jnp.where(live, t, INF), nx, ny, nz

        def row_hit_wall(i):
            # branch-free variant for all-ROTBOX_WALL clusters (hex maze
            # walls live in their own typed prop segment, so wall clusters
            # are homogeneous); returns the per-pixel color plane too
            live = pload(i, 0) >= 0
            t, nx, ny, nz, c = prim_rotbox_wall(
                pload(i, 1), pload(i, 2), pload(i, 3),
                pload(i, 5), pload(i, 6),
                pload(i, 8), pload(i, 9), pload(i, 10),
                pload(i, 7), pload(i, 11))
            return jnp.where(live, t, INF), nx, ny, nz, c

        def row_hit_ellipsoid(i):
            # branch-free variant for all-ELLIPSOID clusters (spheres /
            # capsules — typed prop segments make these homogeneous)
            live = pload(i, 0) >= 0
            t, nx, ny, nz = prim_ellipsoid(
                pload(i, 1), pload(i, 2), pload(i, 3),
                pload(i, 4), pload(i, 5), pload(i, 6))
            return jnp.where(live, t, INF), nx, ny, nz

        def row_hit_cylinder(i):
            live = pload(i, 0) >= 0
            t, nx, ny, nz = prim_cylinder(
                pload(i, 1), pload(i, 2), pload(i, 3),
                pload(i, 4), pload(i, 5), pload(i, 6))
            return jnp.where(live, t, INF), nx, ny, nz

        def row_hit_cone(i):
            # unified cone body: the flip sign comes from the ROW type, so
            # CONE/CONE_FLIPPED-mixed clusters (diamond top+bottom pairs)
            # stay branch-free; the math equals the switch's branches 3/4
            # exactly.
            ptype = pload(i, 0)
            s_ = jnp.where(ptype == PRIM_CONE, jnp.float32(1.0),
                           jnp.float32(-1.0))
            t, nx, ny, nz = prim_cone(
                pload(i, 1), pload(i, 2), pload(i, 3),
                pload(i, 4), pload(i, 5), pload(i, 6), s_)
            return jnp.where(ptype >= 0, t, INF), nx, ny, nz

        # Carry layout: (bt, [bidx], bnx, bny, bnz, bcode, bc). bcode is the
        # deferred-normal face-axis code (0/1/2) set by the all-AABB fast path;
        # 3 means "normals live in bnx/bny/bnz" (generic and rotbox paths, and
        # the sky init). The final normal is decoded once per tile.
        CODE_DIRECT = jnp.int32(3)

        def make_body(hit_fn, aabb=False, with_color=False):
            # with_color: hit_fn returns (t, nx, ny, nz, c) — the packed hit
            # color comes from the routine (per-pixel for ROTBOX_WALL rows)
            # instead of the row's color column.
            def body(i, carry):
                bt, bnx, bny, bnz, bcode, bc = carry
                if aabb:
                    t, code = hit_fn(i)
                    closer = t < bt
                    return (
                        jnp.where(closer, t, bt),
                        bnx, bny, bnz,
                        jnp.where(closer, code, bcode),
                        jnp.where(closer, pload(i, 7), bc),
                    )
                if with_color:
                    t, nx, ny, nz, c = hit_fn(i)
                else:
                    t, nx, ny, nz = hit_fn(i)
                    c = pload(i, 7)
                closer = t < bt
                return (
                    jnp.where(closer, t, bt),
                    jnp.where(closer, nx, bnx),
                    jnp.where(closer, ny, bny),
                    jnp.where(closer, nz, bnz),
                    jnp.where(closer, CODE_DIRECT, bcode),
                    jnp.where(closer, c, bc),
                )
            return body

        def make_body_tiebreak(hit_fn, aabb=False, with_color=False):
            # Variant carrying the winning row index: ties (t == bt) resolve to
            # the LOWEST row index, which is exactly what in-order traversal's
            # strict `t < bt` produces — so any cluster traversal order yields
            # the bit-identical image.
            def body(i, carry):
                bt, bidx, bnx, bny, bnz, bcode, bc = carry
                if aabb:
                    t, code = hit_fn(i)
                    ii = jnp.full_like(bidx, 0) + i
                    closer = (t < bt) | ((t == bt) & (ii < bidx))
                    return (
                        jnp.where(closer, t, bt),
                        jnp.where(closer, ii, bidx),
                        bnx, bny, bnz,
                        jnp.where(closer, code, bcode),
                        jnp.where(closer, pload(i, 7), bc),
                    )
                if with_color:
                    t, nx, ny, nz, c = hit_fn(i)
                else:
                    t, nx, ny, nz = hit_fn(i)
                    c = pload(i, 7)
                ii = jnp.full_like(bidx, 0) + i
                closer = (t < bt) | ((t == bt) & (ii < bidx))
                return (
                    jnp.where(closer, t, bt),
                    jnp.where(closer, ii, bidx),
                    jnp.where(closer, nx, bnx),
                    jnp.where(closer, ny, bny),
                    jnp.where(closer, nz, bnz),
                    jnp.where(closer, CODE_DIRECT, bcode),
                    jnp.where(closer, c, bc),
                )
            return body

        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        body = make_body(row_hit, with_color=True)

        izero = jnp.zeros((TILE_H, TILE_W), jnp.int32)
        init = (zero + INF, zero, zero, zero, izero + CODE_DIRECT, zero)
        if cluster_k:
            # Outer loop over clusters; the cluster AABB is slab-tested against
            # the whole tile INCLUDING the current closest-hit depths, and the K
            # per-row intersection routines run only if some ray could still
            # produce a closer hit (frustum + occlusion culling in one test).
            # With sorted_order, clusters are visited front-to-back per agent
            # (order_ref from sort_clusters), so near geometry tightens the depth
            # planes before far clusters are tested — most then skip outright.
            def cluster_body(g, carry, maxt_in=None):
                if sorted_order and not super_k:
                    g = (order_ref[0, 0, tile_row, g] if per_tile
                         else order_ref[0, agent, g])
                return cluster_body_at(g, carry, maxt_in)

            def cluster_body_at(g, carry, maxt_in=None):
                bt = carry[0]
                lo0 = cload(g, 0)
                lo1 = cload(g, 1)
                lo2 = cload(g, 2)
                hi0 = cload(g, 3)
                hi1 = cload(g, 4)
                hi2 = cload(g, 5)
                t1x = lo0 * ix - exix
                t2x = hi0 * ix - exix
                t1y = lo1 * iy - eyiy
                t2y = hi1 * iy - eyiy
                t1z = lo2 * iz - eziz
                t2z = hi2 * iz - eziz
                tmin = jnp.maximum(jnp.minimum(t1x, t2x),
                                   jnp.maximum(jnp.minimum(t1y, t2y),
                                               jnp.minimum(t1z, t2z)))
                tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                                   jnp.minimum(jnp.maximum(t1y, t2y),
                                               jnp.maximum(t1z, t2z)))
                # No tmin > near condition: a camera inside the cluster AABB
                # (tmin < 0) must still process it. The 0.01 slack absorbs float
                # rounding between the slab products here and the per-type
                # intersection routines (a quadric's true hit can land an ulp
                # below the cluster entry); t <= far = 120, so the slack costs
                # nothing in culling power but keeps culling bit-exact.
                reachable = (tmax >= tmin) & (tmax > 0.0) & (tmin < bt + 0.01)

                mk = make_body_tiebreak if sorted_order else make_body
                row_body = mk(row_hit, with_color=True)
                row_body_aabb = mk(row_hit_aabb, aabb=True)
                row_body_rot = mk(row_hit_rotbox)
                row_body_ell = mk(row_hit_ellipsoid)
                row_body_cyl = mk(row_hit_cylinder)
                row_body_cone = mk(row_hit_cone)
                row_body_wall = mk(row_hit_wall, with_color=True)

                # One scalar switch decides skip / generic / homogeneous fast
                # paths (all-AABB, all-ROTBOX, all-ellipsoid, all-cylinder
                # and cone/cone-flipped clusters — merged layout boxes, hex
                # walls, landmark props and diamonds — skip the per-row type
                # dispatch; clusters_ref[...,6] tag from build_clusters).
                tag = cload(g, 6).astype(jnp.int32)

                def run(rb, c):
                    for j in range(cluster_k):
                        c = rb(g * cluster_k + j, c)
                    if maxt_in is None:
                        return c
                    return (jnp.max(c[0]), *c)

                skip = (lambda c: c) if maxt_in is None else (
                    lambda c: (maxt_in, *c))
                is_cone = ((tag == PRIM_CONE) | (tag == PRIM_CONE_FLIPPED)
                           | (tag == TAG_CONE_MIXED))
                branch = jnp.where(
                    jnp.any(reachable),
                    jnp.where(tag == PRIM_AABB, jnp.int32(2),
                    jnp.where(tag == PRIM_ROTBOX, jnp.int32(3),
                    jnp.where(tag == PRIM_ELLIPSOID, jnp.int32(4),
                    jnp.where(tag == PRIM_CYLINDER, jnp.int32(5),
                    jnp.where(is_cone, jnp.int32(6),
                    jnp.where(tag == PRIM_ROTBOX_WALL, jnp.int32(7),
                              jnp.int32(1))))))),
                    jnp.int32(0))
                return jax.lax.switch(branch, [
                    skip,
                    functools.partial(run, row_body),
                    functools.partial(run, row_body_aabb),
                    functools.partial(run, row_body_rot),
                    functools.partial(run, row_body_ell),
                    functools.partial(run, row_body_cyl),
                    functools.partial(run, row_body_cone),
                    functools.partial(run, row_body_wall),
                ], carry)

            num_groups = num_prims // cluster_k
            if bit_walk:
                # Bit-walk traversal with a depth bound: the prologue
                # (cull_bits) decided per tile which clusters can contribute
                # and ordered the surviving superclusters FRONT-TO-BACK by a
                # per-tile hit-distance lower bound. The kernel walks that
                # list with scalar-only control flow — bitmask word loads,
                # shifts, scalar conds/switches — and carries a SCALAR upper
                # bound `maxt` on the tile's per-ray depths, refreshed (one
                # vector reduction) only after a supercluster whose members
                # actually ran. Members behind the bound skip on a pure
                # scalar compare; the walk TERMINATES at the first listed
                # supercluster beyond the bound (the list is ascending).
                # Measured rationale: frustum survivors are ~50 rows/tile on
                # hex scenes while rows reachable under the final depths are
                # <1 (scripts/analyze_culling.py) — occlusion is the whole
                # game, and the old per-visited-cluster jnp.any syncs are
                # replaced by ~1-2 per-PROCESSED-supercluster reductions.
                # Rows process out of table order, so every row body carries
                # the winning row index: ties (t == bt) resolve to the lowest
                # row index, exactly what in-order traversal's strict
                # `t < bt` produces — the image is bit-identical regardless
                # of visit order (tested).
                row_body = make_body_tiebreak(row_hit, with_color=True)
                row_body_aabb = make_body_tiebreak(row_hit_aabb, aabb=True)
                row_body_rot = make_body_tiebreak(row_hit_rotbox)
                row_body_ell = make_body_tiebreak(row_hit_ellipsoid)
                row_body_cyl = make_body_tiebreak(row_hit_cylinder)
                row_body_cone = make_body_tiebreak(row_hit_cone)
                row_body_wall = make_body_tiebreak(row_hit_wall,
                                                   with_color=True)

                def run_cluster(gc, carry):
                    tag = cload(gc, 6).astype(jnp.int32)

                    def run(rb, c):
                        for j in range(cluster_k):
                            c = rb(gc * cluster_k + j, c)
                        return c

                    is_cone = ((tag == PRIM_CONE) | (tag == PRIM_CONE_FLIPPED)
                               | (tag == TAG_CONE_MIXED))
                    branch = jnp.where(tag == PRIM_AABB, jnp.int32(1),
                             jnp.where(tag == PRIM_ROTBOX, jnp.int32(2),
                             jnp.where(tag == PRIM_ELLIPSOID, jnp.int32(3),
                             jnp.where(tag == PRIM_CYLINDER, jnp.int32(4),
                             jnp.where(is_cone, jnp.int32(5),
                             jnp.where(tag == PRIM_ROTBOX_WALL, jnp.int32(6),
                                       jnp.int32(0)))))))
                    return jax.lax.switch(branch, [
                        functools.partial(run, row_body),
                        functools.partial(run, row_body_aabb),
                        functools.partial(run, row_body_rot),
                        functools.partial(run, row_body_ell),
                        functools.partial(run, row_body_cyl),
                        functools.partial(run, row_body_cone),
                        functools.partial(run, row_body_wall),
                    ], carry)

                # walk the compact per-tile survivor list; the sentinel
                # (== num_super) terminates. Mean list length is ~4-6, so
                # the loop does no idle iterations at all.
                num_super_g = num_groups // super_k
                # Safety margin for the depth-bound compares: cdist/scdist
                # are true geometric lower bounds (eye -> cluster-AABB
                # distance, unit ray dirs => t of ANY member hit >= that
                # distance) computed in f32; the 0.01 slack absorbs their
                # few-ulp rounding, so a skipped cluster's hits satisfy
                # t > maxt >= max(bt) STRICTLY — no `t < bt` win and no
                # `t == bt` tie is possible. Costs ~nothing in culling power
                # (bounds span [0, 120]).
                SLACK = jnp.float32(0.01)

                def sc_cond(state):
                    g, maxt = state[0], state[1]
                    gi = jnp.minimum(g, num_super_g - 1)
                    return ((g < num_super_g)
                            & (sclist_ref[0, 0, tile_row, g] < num_super_g)
                            & (scdist_ref[0, 0, tile_row, gi]
                               <= maxt + SLACK))

                def sc_body(state):
                    g, maxt, nproc = state[0], state[1], state[2]
                    carry = state[3:]
                    gs = sclist_ref[0, 0, tile_row, g]

                    ran = jnp.int32(0)
                    for j in range(super_k):
                        gc = gs * super_k + j
                        wc_ = clbits_ref[0, 0, tile_row, gc >> 5]
                        cb = (wc_ >> (gc & 31)) & 1
                        ok = (cb != 0) & (cdist_ref[0, agent, gc]
                                          <= maxt + SLACK)
                        carry = jax.lax.cond(
                            ok, functools.partial(run_cluster, gc),
                            lambda cc: cc, carry)
                        ran = ran | ok.astype(jnp.int32)
                    nproc = nproc + ran
                    # Refresh the scalar bound sparingly: every refresh is a
                    # vector->scalar sync (pipeline drain), and almost all of
                    # the bound's value comes from the FIRST processed
                    # supercluster (the nearest occluder). Tiles that see far
                    # (jump apex over the walls) process several superclusters
                    # with no skippable tail — refreshing after each one paid
                    # sync cost for nothing. Refresh after the 1st, 5th,
                    # 9th, ... processed supercluster; staleness only delays
                    # skips, never breaks correctness (maxt only ever
                    # overestimates max(bt)).
                    maxt = jax.lax.cond(
                        (ran != 0) & ((nproc & 3) == 1),
                        lambda c: jnp.max(c[0]),
                        lambda c: maxt, carry)
                    return (g + 1, maxt, nproc, *carry)

                # bt starts at the FAR plane (not +INF): hits at t >= far
                # render as sky either way (miss test is t >= far), and a
                # tile whose rays all miss then has maxt == far instead of
                # an unskippable +INF bound — the exact trick the earlier
                # early-exit path used, with the same bit-identity argument.
                init_b = (zero + np.float32(C.CAMERA_FAR),
                          jnp.full((TILE_H, TILE_W), num_prims, jnp.int32),
                          *init[1:])
                st = jax.lax.while_loop(
                    sc_cond,
                    sc_body,
                    (jnp.int32(0), jnp.float32(C.CAMERA_FAR), jnp.int32(0),
                     *init_b))
                t, _, nx, ny, nz, ncode, cpk = st[3:]
            elif super_k:
                # Two-level culling: the per-tile front-to-back list is over
                # SUPERclusters (super_k consecutive clusters, AABB from
                # build_superclusters). One vector slab test per visited
                # supercluster prunes super_k*cluster_k rows at once; members
                # then run the normal per-cluster test + rows. List length (and
                # the XLA sort feeding it) shrinks by super_k — the sort's cost
                # is strongly superlinear in list length on TPU, so this is
                # where the prep time goes. Early exit uses the supercluster
                # distance bounds (lower bounds for every member hit).
                num_super = num_clusters // super_k

                def sc_body(state):
                    gpos, maxt = state[0], state[1]
                    carry = state[2:]
                    bt = carry[0]
                    gsc = (order_ref[0, 0, tile_row, gpos] if per_tile
                           else order_ref[0, agent, gpos])
                    lo0 = scload(gsc, 0)
                    lo1 = scload(gsc, 1)
                    lo2 = scload(gsc, 2)
                    hi0 = scload(gsc, 3)
                    hi1 = scload(gsc, 4)
                    hi2 = scload(gsc, 5)
                    t1x = lo0 * ix - exix
                    t2x = hi0 * ix - exix
                    t1y = lo1 * iy - eyiy
                    t2y = hi1 * iy - eyiy
                    t1z = lo2 * iz - eziz
                    t2z = hi2 * iz - eziz
                    tmin = jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.maximum(jnp.minimum(t1y, t2y),
                                                   jnp.minimum(t1z, t2z)))
                    tmax = jnp.minimum(jnp.maximum(t1x, t2x),
                                       jnp.minimum(jnp.maximum(t1y, t2y),
                                                   jnp.maximum(t1z, t2z)))
                    # same slack reasoning as the member-cluster test; the SC
                    # AABB contains every member AABB, so this is conservative
                    reachable = (tmax >= tmin) & (tmax > 0.0) & (tmin < bt + 0.01)

                    def run_members(c):
                        st = (maxt, *c)
                        for j in range(super_k):
                            st = cluster_body_at(gsc * super_k + j, st[1:],
                                                 maxt_in=st[0])
                        return st

                    st = jax.lax.cond(jnp.any(reachable), run_members,
                                      lambda c: (maxt, *c), carry)
                    return (gpos + 1, *st)

                def sc_cond(state):
                    gpos, maxt = state[0], state[1]
                    gi = jnp.minimum(gpos, num_super - 1)
                    d = (dist_ref[0, 0, tile_row, gi] if per_tile
                         else dist_ref[0, agent, gi])
                    return (gpos < num_super) & (maxt >= d)

                init_e = (jnp.int32(0),
                          jnp.float32(C.CAMERA_FAR),
                          zero + np.float32(C.CAMERA_FAR),
                          jnp.full((TILE_H, TILE_W), num_prims, jnp.int32),
                          *init[1:])
                _, _, t, _, nx, ny, nz, ncode, cpk = jax.lax.while_loop(
                    sc_cond, sc_body, init_e)
            elif sorted_order and early_exit:
                # Early ray termination. Clusters arrive front-to-back and
                # dist_ref[agent, g] is a lower bound on any hit distance from
                # cluster order[g] (ascending). Once every ray in the tile has a
                # hit STRICTLY closer than that bound, no remaining cluster can
                # change any pixel: a new hit would satisfy
                # t >= dist[g] > max(bt) >= bt, so `t < bt` is false and the
                # tie-break `t == bt` is impossible. The depth carry starts at the
                # far plane (not +INF) so sky tiles terminate once the remaining
                # clusters are beyond the far plane; a hit at t >= far renders as
                # sky either way (miss test is t >= far), so the image is
                # bit-identical.
                #
                # The tile's max depth rides the loop state as a SCALAR, refreshed
                # (one vector reduction) only when a cluster's rows actually ran —
                # bt never changes otherwise, so the carried value stays exact and
                # the loop condition is pure scalar work (no vector->scalar sync
                # per skipped cluster).
                init_e = (jnp.int32(0),
                          jnp.float32(C.CAMERA_FAR),
                          zero + np.float32(C.CAMERA_FAR),
                          jnp.full((TILE_H, TILE_W), num_prims, jnp.int32),
                          *init[1:])

                def w_cond(state):
                    g, maxt = state[0], state[1]
                    gi = jnp.minimum(g, num_groups - 1)
                    d = (dist_ref[0, 0, tile_row, gi] if per_tile
                         else dist_ref[0, agent, gi])
                    return (g < num_groups) & (maxt >= d)

                def w_body(state):
                    g, maxt = state[0], state[1]
                    carry = cluster_body(g, state[2:], maxt_in=maxt)
                    return (g + 1, *carry)

                _, _, t, _, nx, ny, nz, ncode, cpk = jax.lax.while_loop(
                    w_cond, w_body, init_e)
            elif sorted_order:
                init_s = (init[0], jnp.full((TILE_H, TILE_W), num_prims, jnp.int32),
                          *init[1:])
                t, _, nx, ny, nz, ncode, cpk = jax.lax.fori_loop(
                    0, num_groups, cluster_body, init_s)
            else:
                t, nx, ny, nz, ncode, cpk = jax.lax.fori_loop(
                    0, num_groups, cluster_body, init)
        else:
            t, nx, ny, nz, ncode, cpk = jax.lax.fori_loop(0, num_prims, body, init)

        # decode deferred AABB normals: -sign(d) on the coded face axis — the
        # exact per-row expression of the inline path, evaluated once per tile.
        aabb_win = ncode < CODE_DIRECT
        nx = jnp.where(aabb_win, jnp.where(ncode == 0, -jnp.sign(dx), 0.0), nx)
        ny = jnp.where(aabb_win, jnp.where(ncode == 1, -jnp.sign(dy), 0.0), ny)
        nz = jnp.where(aabb_win, jnp.where(ncode == 2, -jnp.sign(dz), 0.0), nz)

        # unpack the carried albedo once per tile (f32(k)/255 == palette entry)
        pk = cpk.astype(jnp.int32)
        cr = ((pk >> 16) & 0xFF).astype(jnp.float32) / 255.0
        cg = ((pk >> 8) & 0xFF).astype(jnp.float32) / 255.0
        cb = (pk & 0xFF).astype(jnp.float32) / 255.0

        # ---- shading (Blinn-Phong, light (0,4,2) x 0.66, shininess 300) ----
        px = ex + t * dx
        py = ey + t * dy
        pz = ez + t * dz
        lx = C.LIGHT_POSITION[0] - px
        ly = C.LIGHT_POSITION[1] - py
        lz = C.LIGHT_POSITION[2] - pz
        inv = jax.lax.rsqrt(lx * lx + ly * ly + lz * lz + 1e-12)
        lx, ly, lz = lx * inv, ly * inv, lz * inv
        ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        hx, hy, hz = lx - dx, ly - dy, lz - dz
        inv_h = jax.lax.rsqrt(hx * hx + hy * hy + hz * hz + 1e-12)
        ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0) * inv_h
        spec = pow_shininess(ndh)

        lc = np.float32(C.LIGHT_COLOR[0])
        diff = 0.3 + ndl * lc
        sp_term = spec * lc
        miss = t >= C.CAMERA_FAR
        r = jnp.where(miss, C.SKY_COLOR[0], cr * diff + sp_term)
        g = jnp.where(miss, C.SKY_COLOR[1], cg * diff + sp_term)
        b = jnp.where(miss, C.SKY_COLOR[2], cb * diff + sp_term)

        # ---- HUD time bar (scenario_default.hpp:140-145, 164-169) ----
        bar_half_u = 0.24 * time_frac / (0.2 * tan_h)
        bar_v = np.float32(-0.131 / (0.2 * tan_v))
        bar_half_v = np.float32(0.0015 / (0.2 * tan_v))
        uu = (cols + 0.5) / width * 2.0 - 1.0
        vv = 1.0 - (rowf + 0.5) / height * 2.0
        in_bar = (jnp.abs(uu) <= bar_half_u) & (jnp.abs(vv - bar_v) <= bar_half_v)
        bar = C.PALETTE[C.COLOR_IDX["BLUE"]] * (0.3 + C.LIGHT_COLOR[0])
        r = jnp.where(in_bar, np.float32(bar[0]), r)
        g = jnp.where(in_bar, np.float32(bar[1]), g)
        b = jnp.where(in_bar, np.float32(bar[2]), b)

        if ui_indicators:
            # Reward indicator quads (scenario_default.hpp:147-162, 171-186):
            # GREEN at camera x=-0.23 while lastReward>eps, RED at +0.23 while
            # <-eps; half extents (0.06, 0.04*|lastReward|). Same 2D compositing
            # as ops/raycast._hud_planes so backends stay bit-identical.
            lr = cam_ref[0, agent, 6]
            feps = np.float32(1.19209290e-07)
            ind_half_u = np.float32(0.06 / (0.2 * tan_h))
            ind_cu = np.float32(0.23 / (0.2 * tan_h))
            half_v = 0.04 * jnp.abs(lr) / np.float32(0.2 * tan_v)
            in_v_ind = jnp.abs(vv) <= half_v
            pos_m = (lr > feps) & (jnp.abs(uu + ind_cu) <= ind_half_u) & in_v_ind
            neg_m = (lr < -feps) & (jnp.abs(uu - ind_cu) <= ind_half_u) & in_v_ind
            green = C.PALETTE[C.COLOR_IDX["GREEN"]] * (0.3 + C.LIGHT_COLOR[0])
            red = C.PALETTE[C.COLOR_IDX["RED"]] * (0.3 + C.LIGHT_COLOR[0])
            r = jnp.where(pos_m, np.float32(green[0]), jnp.where(neg_m, np.float32(red[0]), r))
            g = jnp.where(pos_m, np.float32(green[1]), jnp.where(neg_m, np.float32(red[1]), g))
            b = jnp.where(pos_m, np.float32(green[2]), jnp.where(neg_m, np.float32(red[2]), b))

        to8 = lambda c: jnp.clip(c * 255.0 + 0.5, 0.0, 255.0).astype(jnp.int32)
        packed = (to8(r) << 16) | (to8(g) << 8) | to8(b)
        if merge_tiles:
            out_ref[0, 0, pl.ds(tile_row * TILE_H, TILE_H), :] = packed
        else:
            out_ref[0, 0] = packed

    if merge_tiles:
        jax.lax.fori_loop(0, height // TILE_H,
                          lambda t, c: (_tile(t), 0)[1], 0)
    else:
        _tile(pl.program_id(2))


def render_packed(cams: jax.Array, prims: jax.Array, height: int, width: int,
                  clusters: jax.Array | None = None,
                  order: jax.Array | None = None,
                  dist: jax.Array | None = None,
                  interpret: bool = False,
                  ui_indicators: bool = False,
                  sclusters: jax.Array | None = None,
                  merge_tiles: bool = False,
                  scbits: jax.Array | None = None,
                  clbits: jax.Array | None = None,
                  scdist: jax.Array | None = None,
                  cdist: jax.Array | None = None) -> jax.Array:
    """cams [B, A, 8] f32, prims [B, M, 16] f32 -> packed RGB int32 [B,A,H,W].

    With `clusters` [B, M // CLUSTER_K, 8] (from build_clusters, which also
    pads the table), the kernel skips whole row groups per tile when the
    cluster AABB cannot beat the tile's current closest hits. With `order`
    [B, A, G] int32 (from sort_clusters), clusters are traversed
    front-to-back per agent; the row-index tie-break keeps the image
    bit-identical to in-table-order traversal. With `dist` [B, A, G] f32
    (sort_clusters' second output: ascending hit-distance lower bounds for
    the ordered clusters), the per-tile loop additionally TERMINATES as soon
    as every ray's closest hit is strictly nearer than the next cluster's
    bound — `dist` must correspond to `order` or the image is wrong.

    order/dist may instead be PER-TILE lists [B, A, H/TILE_H, G] (from
    frustum_cull): clusters outside a tile's view frustum carry dist=+INF and
    sort last, so the loop never visits them at all."""
    bsz, num_agents, _ = cams.shape
    num_prims = prims.shape[1]
    assert height % TILE_H == 0 and width == TILE_W, (height, width)
    per_tile = order is not None and order.ndim == 4

    cluster_k = 0
    # Every access to the primitive/cluster tables is a dynamic SCALAR load
    # broadcast against the ray tile — that is what the scalar memory is for
    # (a VMEM scalar read costs a vector access). Tables are per-env blocks;
    # keep the prim table in SMEM whenever it plausibly fits alongside the
    # other scalar blocks.
    row_w = prims.shape[-1]
    assert row_w == ROW_W, row_w
    prim_flat = num_prims * row_w * 4 <= PRIM_SMEM_LIMIT_BYTES
    inputs = [cams]
    in_specs = [
        pl.BlockSpec((1, num_agents, 8), lambda b, a, h: (b, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    if prim_flat:
        # SMEM pads each window's minor dim to 1 KB: ship the table as one
        # flat [1, M*12] vector per env (the kernel strides by ROW_W; the
        # middle singleton keeps the last two block dims equal to the array's,
        # which the TPU lowering requires).
        inputs.append(prims.reshape(bsz, 1, num_prims * row_w))
        in_specs.append(
            pl.BlockSpec((1, 1, num_prims * row_w), lambda b, a, h: (b, 0, 0),
                         memory_space=pltpu.SMEM))
    else:
        inputs.append(prims)
        in_specs.append(
            pl.BlockSpec((1, num_prims, row_w), lambda b, a, h: (b, 0, 0),
                         memory_space=pltpu.VMEM))
    super_k = 0
    bit_walk = scbits is not None
    if clusters is not None:
        cluster_k = CLUSTER_K
        assert num_prims % cluster_k == 0, (num_prims, cluster_k)
        assert clusters.shape[1] >= num_prims // cluster_k
        inputs.append(clusters.reshape(bsz, 1, clusters.shape[1] * 8))
        in_specs.append(
            pl.BlockSpec((1, 1, clusters.shape[1] * 8),
                         lambda b, a, h: (b, 0, 0),
                         memory_space=pltpu.SMEM))
        if bit_walk:
            # compact per-tile front-to-back survivor lists + packed member
            # bitmasks + depth-bound tables (cull_bits): scalar-only
            # traversal
            assert clbits is not None and order is None and sclusters is None
            assert scdist is not None and cdist is not None
            super_k = SUPER_K
            assert num_prims == clusters.shape[1] * cluster_k, \
                (num_prims, clusters.shape[1])  # pad_prims_to_clusters
            assert clusters.shape[1] % super_k == 0, clusters.shape
            t = height // TILE_H
            g = clusters.shape[1]
            assert clbits.shape == (bsz, num_agents, t, -(-g // 32)), clbits.shape
            assert scbits.shape == (bsz, num_agents, t,
                                    g // super_k), scbits.shape
            assert scdist.shape == scbits.shape, (scdist.shape, scbits.shape)
            assert cdist.shape == (bsz, num_agents, g), cdist.shape
            for bits in (scbits, clbits, scdist):
                inputs.append(bits)
                in_specs.append(
                    pl.BlockSpec((1, 1, t, bits.shape[-1]),
                                 lambda b, a, h: (b, a, 0, 0),
                                 memory_space=pltpu.SMEM))
            inputs.append(cdist)
            in_specs.append(
                pl.BlockSpec((1, num_agents, g), lambda b, a, h: (b, 0, 0),
                             memory_space=pltpu.SMEM))
        elif sclusters is not None:
            # supercluster mode: order/dist index the SC table
            assert order is not None and dist is not None and per_tile
            super_k = SUPER_K
            assert clusters.shape[1] == sclusters.shape[1] * super_k
            inputs.append(sclusters.reshape(bsz, 1, sclusters.shape[1] * 8))
            in_specs.append(
                pl.BlockSpec((1, 1, sclusters.shape[1] * 8),
                             lambda b, a, h: (b, 0, 0),
                             memory_space=pltpu.SMEM))
        if order is not None:
            g = (sclusters.shape[1] if sclusters is not None
                 else clusters.shape[1])
            if per_tile:
                t = height // TILE_H
                assert order.shape == (bsz, num_agents, t, g)
                assert dist is not None and dist.shape == order.shape
                # SMEM blocks must keep the last two dims whole: ship the
                # full [T, G] plane per (env, agent); the kernel indexes its
                # tile row.
                spec = pl.BlockSpec((1, 1, t, g), lambda b, a, h: (b, a, 0, 0),
                                    memory_space=pltpu.SMEM)
                inputs += [order, dist]
                in_specs += [spec, spec]
            else:
                assert order.shape == (bsz, num_agents, g)
                inputs.append(order)
                in_specs.append(
                    pl.BlockSpec((1, num_agents, g), lambda b, a, h: (b, 0, 0),
                                 memory_space=pltpu.SMEM))
                if dist is not None:
                    assert dist.shape == order.shape
                    inputs.append(dist)
                    in_specs.append(
                        pl.BlockSpec((1, num_agents, g),
                                     lambda b, a, h: (b, 0, 0),
                                     memory_space=pltpu.SMEM))

    kernel = functools.partial(
        _render_kernel, height=height, width=width, num_prims=num_prims,
        cluster_k=cluster_k, sorted_order=order is not None,
        early_exit=order is not None and dist is not None,
        per_tile=per_tile, prim_flat=prim_flat, ui_indicators=ui_indicators,
        super_k=super_k,
        num_clusters=clusters.shape[1] if clusters is not None else 0,
        merge_tiles=merge_tiles, bit_walk=bit_walk,
    )
    if merge_tiles:
        # One program per (env, agent): the kernel loops the tile rows
        # internally, amortizing per-program setup + block DMA. Index maps
        # drop the h coordinate; the out block is the whole frame.
        in_specs = [
            pl.BlockSpec(sp.block_shape,
                         functools.partial(lambda im, b, a: im(b, a, 0),
                                           sp.index_map),
                         memory_space=sp.memory_space)
            for sp in in_specs
        ]
        return pl.pallas_call(
            kernel,
            grid=(bsz, num_agents),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, height, width),
                                   lambda b, a: (b, a, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, num_agents, height, width),
                                           jnp.int32),
            interpret=interpret,
        )(*inputs)
    return pl.pallas_call(
        kernel,
        grid=(bsz, num_agents, height // TILE_H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, TILE_H, TILE_W),
                               lambda b, a, h: (b, a, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, num_agents, height, width), jnp.int32),
        interpret=interpret,
    )(*inputs)


def build_clusters(prims: jax.Array, k: int = CLUSTER_K):
    """Pad a prim table [M, 16] to a multiple of k rows and build the cluster
    AABB table [M'/k, 8] (lo xyz, hi xyz, 2 pad). Per-row bounds are
    conservative per type; dead rows (type < 0) take an inverted AABB so they
    never inflate a live cluster, and all-dead clusters collapse to a far
    point box (an inverted box fails the slab test only after min/max
    normalization, which would *pass* it)."""
    m = prims.shape[0]
    pad = (-m) % k
    if pad:
        dead = jnp.zeros((pad, prims.shape[1]), prims.dtype).at[:, 0].set(-1.0)
        prims = jnp.concatenate([prims, dead])
    ptype = prims[:, 0].astype(jnp.int32)
    a = prims[:, 1:4]
    b = prims[:, 4:7]
    c = prims[:, 8:11]

    # Conservative half extents about center `a` for non-box rows.
    quad_he = jnp.stack([b[:, 0], b[:, 2], b[:, 1]], axis=1)  # cyl/cone
    # y-rotated box: exact world AABB of the rotated extents (b carries
    # (yaw, cos yaw, sin yaw) for rotbox rows — build_prim_table)
    cy, sy = jnp.abs(b[:, 1]), jnp.abs(b[:, 2])
    rot_he = jnp.stack(
        [c[:, 0] * cy + c[:, 2] * sy, c[:, 1], c[:, 0] * sy + c[:, 2] * cy],
        axis=1)
    he = jnp.where((ptype == PRIM_ELLIPSOID)[:, None], b, quad_he)
    he = jnp.where((ptype == PRIM_EYEBOX)[:, None], _EYE_BOUND, he)
    he = jnp.where((ptype == PRIM_ROTBOX)[:, None], rot_he, he)
    # fused wall rows: the AABB must also cover the derived edging box
    # (length x1.02, half-depth 0.2 vs the wall's 0.15; height is within)
    whx = c[:, 0] * np.float32(C.WALL_EDGE_LEN_SCALE)
    whz = jnp.maximum(c[:, 2], np.float32(C.WALL_EDGE_HZ))
    wall_he = jnp.stack(
        [whx * cy + whz * sy, c[:, 1], whx * sy + whz * cy], axis=1)
    he = jnp.where((ptype == PRIM_ROTBOX_WALL)[:, None], wall_he, he)

    is_box = (ptype == PRIM_AABB)[:, None]
    lo = jnp.where(is_box, a, a - he)
    hi = jnp.where(is_box, b, a + he)
    dead = (ptype < 0)[:, None]
    lo = jnp.where(dead, INF, lo)
    hi = jnp.where(dead, -INF, hi)

    g = prims.shape[0] // k
    clo = lo.reshape(g, k, 3).min(axis=1)
    chi = hi.reshape(g, k, 3).max(axis=1)
    empty = chi[:, :1] < clo[:, :1]
    clo = jnp.where(empty, INF, clo)
    chi = jnp.where(empty, INF, chi)
    # Homogeneity tag (column 6): the shared row type if every LIVE row in
    # the cluster has it; TAG_CONE_MIXED when live rows are CONE/CONE_FLIPPED
    # mixed (diamond top+bottom pairs); else -1 (generic switch path). The
    # kernel runs branch-free fast paths for tagged clusters. Dead rows are
    # wildcards; all-dead -> -1.
    grp = ptype.reshape(g, k)
    live = grp >= 0
    ref_t = jnp.max(grp, axis=1)
    any_live = live.any(axis=1)
    same = ((grp == ref_t[:, None]) | ~live).all(axis=1) & any_live
    coney = (((grp == PRIM_CONE) | (grp == PRIM_CONE_FLIPPED) | ~live
              ).all(axis=1) & any_live)
    tag = jnp.where(same, ref_t,
                    jnp.where(coney, TAG_CONE_MIXED, -1)).astype(jnp.float32)
    clusters = jnp.concatenate(
        [clo, chi, tag[:, None], jnp.zeros((g, 1), jnp.float32)], axis=1)
    return prims, clusters


def pad_prims_to_clusters(prims: jax.Array, clusters: jax.Array,
                          k: int = CLUSTER_K) -> jax.Array:
    """Pad a prim table with dead rows so num_prims == num_clusters * k.

    The bit-walk kernel iterates exactly num_prims/(k*SUPER_K) supercluster
    groups; after build_superclusters pads the CLUSTER table to a multiple of
    SUPER_K the prim table must grow to match or tail clusters would be
    dropped from traversal."""
    want = clusters.shape[0] * k
    m = prims.shape[0]
    assert want >= m, (want, m)
    if want == m:
        return prims
    dead = jnp.zeros((want - m, prims.shape[1]), prims.dtype).at[:, 0].set(-1.0)
    return jnp.concatenate([prims, dead])


def build_superclusters(clusters: jax.Array, k: int = SUPER_K):
    """Pad a cluster table [G, 8] to a multiple of k and build the
    supercluster AABB table [G'/k, 8] (lo xyz, hi xyz, 2 pad). Dead clusters
    (point box at +INF, from build_clusters) must not inflate a live
    supercluster; all-dead superclusters collapse to the same +INF point box
    so frustum_cull sorts them last. Returns (clusters_padded, sclusters)."""
    g = clusters.shape[0]
    pad = (-g) % k
    if pad:
        dead = jnp.full((pad, clusters.shape[1]), INF, clusters.dtype)
        dead = dead.at[:, 6:].set(0.0)
        clusters = jnp.concatenate([clusters, dead])
    lo = clusters[:, 0:3]
    hi = clusters[:, 3:6]
    dead = lo[:, :1] > 1e29
    lo = jnp.where(dead, INF, lo)
    hi = jnp.where(dead, -INF, hi)
    n = clusters.shape[0] // k
    slo = lo.reshape(n, k, 3).min(axis=1)
    shi = hi.reshape(n, k, 3).max(axis=1)
    empty = shi[:, :1] < slo[:, :1]
    slo = jnp.where(empty, INF, slo)
    shi = jnp.where(empty, INF, shi)
    sclusters = jnp.concatenate([slo, shi, jnp.zeros((n, 2), jnp.float32)],
                                axis=1)
    return clusters, sclusters


def sort_clusters(cams: jax.Array, clusters: jax.Array):
    """Front-to-back cluster visit order per agent: argsort of the squared
    distance from the camera eye to the closest point of each cluster AABB.
    cams [B, A, 8], clusters [B, G, 8] -> (order int32 [B, A, G],
    dist f32 [B, A, G]). Dead clusters (point box at +INF) sort last.

    `dist[b, a, g]` is the eye distance to the closest point of cluster
    `order[b, a, g]`'s AABB — a lower bound on any ray-hit parameter t from
    that cluster (ray directions are unit length), ascending in g. It drives
    the kernel's early ray termination: once a tile's worst closest-hit is
    strictly below dist[g], clusters g.. cannot contribute."""
    eye = cams[:, :, None, :3]                      # [B, A, 1, 3]
    lo = clusters[:, None, :, 0:3]                  # [B, 1, G, 3]
    hi = clusters[:, None, :, 3:6]
    d = jnp.maximum(jnp.maximum(lo - eye, eye - hi), 0.0)
    key = jnp.sum(d * d, axis=-1)                   # [B, A, G]
    idx = jnp.broadcast_to(
        jnp.arange(key.shape[-1], dtype=jnp.int32), key.shape)
    # one multi-operand sort: argsort + take_along_axis lowers to a sort
    # PLUS a scalarized gather on TPU (the gather alone costs as much as
    # the sort — measured)
    skey, order = jax.lax.sort((key, idx), dimension=-1, num_keys=1)
    return order, jnp.sqrt(skey)


@functools.lru_cache(maxsize=8)
def _tile_dir_bounds(height: int, width: int, tile_h: int = TILE_H,
                     tile_w: int = TILE_W):
    """Static camera-space ray-direction bounds per pixel tile: f32 numpy
    [T, 3] lo and hi, widened by a safety margin so they bound the kernel's
    f32/rsqrt-approximated directions for every pixel of the tile.

    Tiles are (tile_h x tile_w) pixel blocks in row-major block order,
    T = ceil(height/tile_h) * (width/tile_w); the last tile row may extend
    past `height` — those rows are excluded from the bounds (the blocked
    kernel discards their pixels)."""
    rows = np.arange(height, dtype=np.float64)[:, None]
    cols = np.arange(width, dtype=np.float64)[None, :]
    tan_h = np.tan(np.deg2rad(C.CAMERA_FOV_DEG / 2))
    tan_v = tan_h * height / width
    u = ((cols + 0.5) / width * 2.0 - 1.0) * tan_h
    v = (1.0 - (rows + 0.5) / height * 2.0) * tan_v
    inv_len = 1.0 / np.sqrt(u * u + v * v + 1.0)
    d0 = np.stack(np.broadcast_arrays(u * inv_len, v * inv_len,
                                      -inv_len + 0 * u), axis=-1)
    ty = -(-height // tile_h)
    tx = width // tile_w
    margin = 2e-3  # covers TPU rsqrt/trig approximation vs numpy exact
    lo = np.empty((ty * tx, 3), np.float32)
    hi = np.empty((ty * tx, 3), np.float32)
    for iy in range(ty):
        for ix in range(tx):
            blk = d0[iy * tile_h:(iy + 1) * tile_h,
                     ix * tile_w:(ix + 1) * tile_w]
            lo[iy * tx + ix] = blk.min(axis=(0, 1)) - margin
            hi[iy * tx + ix] = blk.max(axis=(0, 1)) + margin
    return lo, hi


def _tile_survive(cams: jax.Array, clusters: jax.Array,
                  height: int, width: int,
                  tile_h: int = TILE_H, tile_w: int = TILE_W) -> jax.Array:
    """Conservative per-tile frustum survival mask [B, A, T, G].

    For each (env, agent, 8-row pixel tile) the cluster AABB is slab-tested
    against INTERVAL ray directions (exact camera-space per-tile bounds
    rotated by the agent's yaw/pitch with interval arithmetic, widened by a
    float-safety margin), so any cluster that any ray of the tile could enter
    in front of the camera and inside the far plane SURVIVES."""
    d0lo, d0hi = _tile_dir_bounds(height, width, tile_h, tile_w)  # [T, 3]
    d0lo = jnp.asarray(d0lo)[None, None]               # [1, 1, T, 3]
    d0hi = jnp.asarray(d0hi)[None, None]

    yaw = cams[:, :, 3:4]                              # [B, A, 1]
    pitch = cams[:, :, 4:5]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)

    def mul(c, lo, hi):
        a, b = c * lo, c * hi
        return jnp.minimum(a, b), jnp.maximum(a, b)

    def add(i1, i2):
        return i1[0] + i2[0], i1[1] + i2[1]

    ax = lambda i: (d0lo[..., i], d0hi[..., i])
    # Same rotation as the kernel: y1 = cp*dy0 - sp*dz0; z1 = sp*dy0 + cp*dz0;
    # dx = cy*dx0 + sy*z1; dy = y1; dz = -sy*dx0 + cy*z1.
    y1 = add(mul(cp, *ax(1)), mul(-sp, *ax(2)))
    z1 = add(mul(sp, *ax(1)), mul(cp, *ax(2)))
    dxi = add(mul(cy, *ax(0)), mul(sy, *z1))
    dyi = y1
    dzi = add(mul(-sy, *ax(0)), mul(cy, *z1))

    eye = cams[:, :, None, None, :3]                   # [B, A, 1, 1, 3]
    lo = clusters[:, None, None, :, 0:3]               # [B, 1, 1, G, 3]
    hi = clusters[:, None, None, :, 3:6]

    eps = 1e-9
    tmin = jnp.full(lo.shape[:-1], -INF, jnp.float32)
    tmax = jnp.full(lo.shape[:-1], INF, jnp.float32)
    for a_i, (dl, dh) in enumerate((dxi, dyi, dzi)):
        dl = dl[..., None]                             # [B, A, T, 1]
        dh = dh[..., None]
        # If the tile's direction interval touches zero on this axis, some
        # ray can be arbitrarily close to parallel: the axis constrains
        # nothing (conservative pass). The kernel's eps-clamp of 1/d is
        # covered: it only maps tiny |d| to huge t, which an unconstrained
        # axis trivially bounds.
        definite = (dl > eps) | (dh < -eps)
        il, ih = 1.0 / dh, 1.0 / dl                    # sign-consistent
        p1 = lo[..., a_i] - eye[..., a_i]
        p2 = hi[..., a_i] - eye[..., a_i]
        c1, c2 = p1 * il, p1 * ih
        c3, c4 = p2 * il, p2 * ih
        ax_min = jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4))
        ax_max = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
        tmin = jnp.where(definite, jnp.maximum(tmin, ax_min), tmin)
        tmax = jnp.where(definite, jnp.minimum(tmax, ax_max), tmax)

    slack = 0.02
    return ((tmax >= tmin - slack) & (tmax > -slack)
            & (tmin < C.CAMERA_FAR + slack))           # [B, A, T, G]


def frustum_cull(cams: jax.Array, clusters: jax.Array,
                 height: int, width: int,
                 tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Per-TILE front-to-back cluster lists with conservative frustum culling.

    cams [B, A, 8], clusters [B, G, 8] ->
        (order int32 [B, A, T, G], dist f32 [B, A, T, G]), T = height/TILE_H.

    Survival is `_tile_survive`'s conservative interval slab test. Culled and
    dead clusters get dist=+INF and sort last: the kernel's early-exit
    condition (max tile depth starts at the far plane) therefore never visits
    them. Survivors keep the eye-distance lower bound used for early
    termination, sorted ascending (front-to-back)."""
    survive = _tile_survive(cams, clusters, height, width, tile_h, tile_w)

    d = jnp.maximum(jnp.maximum(clusters[:, None, :, 0:3] - cams[:, :, None, :3],
                                cams[:, :, None, :3] - clusters[:, None, :, 3:6]),
                    0.0)
    key = jnp.sum(d * d, axis=-1)[:, :, None, :]       # [B, A, 1, G]
    key = jnp.where(survive, jnp.broadcast_to(key, survive.shape), INF)
    idx = jnp.broadcast_to(
        jnp.arange(key.shape[-1], dtype=jnp.int32), key.shape)
    skey, order = jax.lax.sort((key, idx), dimension=-1, num_keys=1)
    return order, jnp.sqrt(skey)


def cull_bits(cams: jax.Array, clusters: jax.Array, height: int, width: int,
              super_k: int = SUPER_K,
              tile_h: int = TILE_H, tile_w: int = TILE_W,
              cluster_mask: jax.Array | None = None):
    """Per-tile survivor lists + depth bounds for the bit-walk kernel.

    cams [B, A, 8], clusters [B, G, 8] (G % super_k == 0) ->
        (sclist int32 [B, A, T, S], clbits int32 [B, A, T, Wc],
         scdist f32 [B, A, T, S], cdist f32 [B, A, G])
    with S = G/super_k, Wc = ceil(G/32). Bit g of clbits is
    `_tile_survive`'s conservative frustum test for cluster g. cdist[g] is
    the eye->cluster-AABB Euclidean distance — a true lower bound on the ray
    parameter of ANY hit against the cluster's rows (dirs are unit length),
    the same metric sort_clusters uses. sclist is the tile's surviving
    superclusters sorted FRONT-TO-BACK by their members' min cdist
    (survivors only), sentinel-terminated (sentinel = S); scdist carries the
    matching sorted bounds (+INF past the survivors).

    Measured rationale for the depth bound (scripts/analyze_culling.py,
    HexMemory): frustum survivors are ~49 rows/tile while rows reachable
    under the final per-ray depths are <1 — nearly all surviving work is
    geometry occluded behind the nearest wall. The kernel consumes the
    bounds with at most ~1-2 vector->scalar syncs per tile (vs the old
    per-visited-cluster jnp.any syncs that made the sorted path 1.5x slower
    end-to-end)."""
    survive = _tile_survive(cams, clusters, height, width, tile_h, tile_w)
    if cluster_mask is not None:
        # conservative per-(env, agent, cluster) visibility bits (scenario
        # PVS, ops/pvs.py): a False bit proves no ray can hit the cluster's
        # rows, so ANDing it in cannot change the image
        survive = survive & cluster_mask[:, :, None, :]
    g = survive.shape[-1]
    assert g % super_k == 0, (g, super_k)

    def pack(sv):
        n = sv.shape[-1]
        w = -(-n // 32)
        pad = w * 32 - n
        if pad:
            sv = jnp.concatenate(
                [sv, jnp.zeros(sv.shape[:-1] + (pad,), bool)], axis=-1)
        sv = sv.reshape(sv.shape[:-1] + (w, 32)).astype(jnp.int32)
        # distinct powers of two per lane: wraparound int32 add == bitwise or
        return jnp.sum(sv << jnp.arange(32, dtype=jnp.int32), axis=-1)

    # Euclidean eye->AABB distance per (env, agent, cluster): exactly
    # sort_clusters' metric. Dead/padding clusters have degenerate AABBs but
    # never pass the clbits test, so their value is irrelevant.
    d = jnp.maximum(jnp.maximum(clusters[:, None, :, 0:3] - cams[:, :, None, :3],
                                cams[:, :, None, :3] - clusters[:, None, :, 3:6]),
                    0.0)
    cdist = jnp.sqrt(jnp.sum(d * d, axis=-1))            # [B, A, G]

    ns = g // super_k
    # per-tile member bound: INF for non-surviving members, so a
    # supercluster's key reflects only members the kernel could actually run
    mdist = jnp.where(survive, cdist[:, :, None, :], INF)
    sc_key = mdist.reshape(mdist.shape[:-1] + (ns, super_k)).min(-1)
    idx = jnp.broadcast_to(jnp.arange(ns, dtype=jnp.int32), sc_key.shape)
    skey, order = jax.lax.sort((sc_key, idx), dimension=-1, num_keys=1)
    sclist = jnp.where(skey < INF, order, jnp.int32(ns))
    return sclist, pack(survive), skey, cdist


# ---------------------------------------------------------------------------
# Primitive-table construction (plain JAX, per env; vmapped by the caller).
# ---------------------------------------------------------------------------

def build_prim_table(
    cfg: EnvConfig,
    box_lo: jax.Array,
    box_hi: jax.Array,
    box_color: jax.Array,
    props: PropState,
    agents: AgentState,
    include_agent_rows: bool = True,
) -> jax.Array:
    """Unified primitive table [M_total, 12] for one env.

    include_agent_rows=False drops the agent body/eye rows: for first-person
    rendering with a single agent they can never be visible (the camera sits
    inside both and inside hits are culled), so the renderer skips them.
    Overview/hires cameras must pass True."""
    # packed-int palette (float-exact: values <= 0xFFFFFF < 2^24)
    pal8 = np.round(np.asarray(C.PALETTE) * 255.0).astype(np.int64)
    palette = jnp.asarray(
        (pal8[:, 0] << 16) | (pal8[:, 1] << 8) | pal8[:, 2], jnp.float32)
    palette = palette[:, None]  # [N, 1]

    # Layout boxes.
    m = box_lo.shape[0]
    t_box = jnp.where(box_color > 0, PRIM_AABB, -1).astype(jnp.float32)
    rows_box = jnp.concatenate(
        [t_box[:, None], box_lo, box_hi, palette[box_color],
         jnp.zeros((m, 4), jnp.float32)], axis=1)

    # Props.
    p = props.type.shape[0]
    pt = props.type.astype(jnp.int32)
    visible = ((props.flags & PROP_FLAG_VISIBLE) != 0) & (pt != C.PROP_NONE)
    sc = jnp.abs(props.scale)
    flipped = props.scale[:, 1] < 0

    ktype = jnp.select(
        [pt == C.PROP_BOX,
         (pt == C.PROP_SPHERE) | (pt == C.PROP_CAPSULE),
         pt == C.PROP_CYLINDER,
         (pt == C.PROP_CONE) & ~flipped,
         (pt == C.PROP_CONE) & flipped,
         pt == C.PROP_ROTBOX,
         pt == C.PROP_ROTBOX_WALL],
        [PRIM_AABB, PRIM_ELLIPSOID, PRIM_CYLINDER, PRIM_CONE, PRIM_CONE_FLIPPED,
         PRIM_ROTBOX, PRIM_ROTBOX_WALL],
        -1,
    )
    ktype = jnp.where(visible, ktype, -1).astype(jnp.float32)

    is_box = (pt == C.PROP_BOX)[:, None]
    is_rot = ((pt == C.PROP_ROTBOX) | (pt == C.PROP_ROTBOX_WALL))[:, None]
    a_vec = jnp.where(is_box, props.pos - sc, props.pos)
    radii = sc.at[:, 1].set(jnp.where(pt == C.PROP_CAPSULE, 2.0 * sc[:, 1], sc[:, 1]))
    quad_b = jnp.stack([sc[:, 0], sc[:, 2], 0.5 * sc[:, 1]], axis=1)
    # rotbox rows ship (yaw, cos yaw, sin yaw): the kernel reads the
    # precomputed trig as scalar loads instead of evaluating two scalar
    # transcendentals per row per tile (~100 per tile on wall-heavy hex
    # scenes — a measured kernel-time term)
    rot_b = jnp.stack([props.yaw, jnp.cos(props.yaw), jnp.sin(props.yaw)],
                      axis=1)
    is_ell = ((pt == C.PROP_SPHERE) | (pt == C.PROP_CAPSULE))[:, None]
    b_vec = jnp.where(is_box, props.pos + sc,
                      jnp.where(is_rot, rot_b, jnp.where(is_ell, radii, quad_b)))
    c_vec = jnp.where(is_rot, sc, jnp.zeros_like(sc))
    # col 11: the fused wall row's edging packed color
    is_wall = (pt == C.PROP_ROTBOX_WALL)[:, None]
    col11 = jnp.where(is_wall, palette[props.color2],
                      jnp.zeros((p, 1), jnp.float32))
    rows_prop = jnp.concatenate(
        [ktype[:, None], a_vec, b_vec, palette[props.color], c_vec, col11],
        axis=1)

    # Agent bodies + eye boxes.
    if not include_agent_rows:
        return jnp.concatenate([rows_box, rows_prop], axis=0)
    num_agents = agents.pos.shape[0]
    body_c = agents.pos + jnp.asarray(
        [0.0, C.AGENT_BODY_OFFSET_Y + 0.09, 0.0], jnp.float32)
    body_r = jnp.tile(jnp.asarray([[0.35, 0.72, 0.35]], jnp.float32), (num_agents, 1))
    agent_colors = jnp.asarray(C.AGENT_COLORS)
    body_rgb = palette[agent_colors[jnp.arange(num_agents) % agent_colors.shape[0]]]
    rows_body = jnp.concatenate(
        [jnp.full((num_agents, 1), PRIM_ELLIPSOID, jnp.float32), body_c, body_r,
         body_rgb, jnp.zeros((num_agents, 4), jnp.float32)], axis=1)

    cam_pos = agents.pos + jnp.asarray(
        [0.0, C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y, 0.0], jnp.float32)
    eye_rgb = jnp.tile(palette[C.COLOR_IDX["AGENT_EYES"]][None], (num_agents, 1))
    rows_eyes = jnp.concatenate(
        [jnp.full((num_agents, 1), PRIM_EYEBOX, jnp.float32), cam_pos,
         jnp.stack([agents.yaw, agents.pitch, jnp.zeros_like(agents.yaw)], axis=1),
         eye_rgb, jnp.zeros((num_agents, 4), jnp.float32)], axis=1)

    return jnp.concatenate([rows_box, rows_prop, rows_body, rows_eyes], axis=0)


def build_cams(cfg: EnvConfig, agents: AgentState, time_fraction,
               last_reward=None) -> jax.Array:
    """Camera table [A, 8] for one env: eye xyz, yaw, pitch, time_fraction,
    lastReward (column 6, drives the UI reward indicators), pad."""
    num_agents = agents.pos.shape[0]
    eye = agents.pos + jnp.asarray(
        [0.0, C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y, 0.0], jnp.float32)
    tf = jnp.broadcast_to(jnp.asarray(time_fraction, jnp.float32), (num_agents,))
    if last_reward is None:
        lr = jnp.zeros((num_agents,), jnp.float32)
    else:
        lr = jnp.broadcast_to(
            jnp.asarray(last_reward, jnp.float32), (num_agents,))
    return jnp.concatenate(
        [eye, agents.yaw[:, None], agents.pitch[:, None], tf[:, None],
         lr[:, None], jnp.zeros((num_agents, 1), jnp.float32)], axis=1)


def unpack_rgb(packed: jax.Array) -> jax.Array:
    """int32 [..., H, W] packed -> uint8 [..., H, W, 3]."""
    r = (packed >> 16) & 0xFF
    g = (packed >> 8) & 0xFF
    b = packed & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)
