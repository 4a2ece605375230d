"""Batched kinematic character controller.

Reimplements the *semantics* of the reference's modified Bullet
btKinematicCharacterController (env/src/kinematic_character_controller.cpp:528-602:
stepUp -> stepForwardAndStrafe -> stepDown -> penetration recovery, plus the
acceleration model in setAcceleration, kcc.cpp:753-792) as a branch-free batched
program over a dense voxel grid. Convex sweeps against axis-aligned voxel
geometry reduce to column scans (grid.highest_floor_below / lowest_ceiling_above)
and a bounded-iteration sweep-and-slide reproducing the Quake2 stop rule of the
reference's slide loop (kcc.cpp:337-393; see _slide_horizontal) — axis-aligned
geometry converges in <= 3 masked sweeps vs the reference's <= 10.

The agent capsule (r=0.33, cylinder h=1.05; agent.cpp:52-54) collides
CIRCLE-exactly in the horizontal plane (entry faces + corner-arc quadratics,
_sweep_horizontal) and sphere-exactly against floors/ceilings (end-sphere dip
scans in ops/grid.py); the one remaining approximation is that the full
[bottom, top] extent blocks horizontally (no end-sphere rounding of the
vertical profile during the horizontal phase).

All functions operate on one environment (agents batched along the leading axis)
and are vmapped over the environment batch by the vector env.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from megaverse_tpu import constants as C
from megaverse_tpu.ops import grid as G
from megaverse_tpu.types import AgentState, GridConfig

HALF_XZ = C.AGENT_CAPSULE_RADIUS        # 0.33
HALF_Y = C.AGENT_HALF_HEIGHT            # 0.855
# Maximum vertical travel in one tick: terminal velocity * dt at 15 Hz, plus the
# step offset. Static bound for the column scans.
MAX_DROP = C.KCC_FALL_SPEED * C.DEFAULT_DT + C.KCC_STEP_HEIGHT + 0.1
MAX_RISE = C.KCC_JUMP_SPEED * C.DEFAULT_DT + C.KCC_STEP_HEIGHT + 0.1
CLAMP_MARGIN = 1e-3


def _span_xz(cfg: GridConfig) -> Tuple[int, int]:
    s = G.span_for(cfg, (2 * HALF_XZ, 2 * HALF_XZ))
    return (s[0], s[1])


def forward_dir(yaw: jax.Array) -> jax.Array:
    """Forward direction from yaw (ref agent.cpp:135-142: -Z forward at yaw 0)."""
    return jnp.stack([-jnp.sin(yaw), jnp.zeros_like(yaw), -jnp.cos(yaw)], axis=-1)


def strafe_left_dir(yaw: jax.Array) -> jax.Array:
    """Strafe-left direction (ref agent.cpp:144-150: -X at yaw 0)."""
    return jnp.stack([-jnp.cos(yaw), jnp.zeros_like(yaw), jnp.sin(yaw)], axis=-1)


def apply_look(agents: AgentState, action: jax.Array, dt: float, vertical_limit: float) -> AgentState:
    """Yaw / pitch integration (ref env.cpp:105-113, agent.cpp:100-126)."""
    look_l = (action & C.ACTION_LOOK_LEFT) != 0
    look_r = (action & C.ACTION_LOOK_RIGHT) != 0
    dyaw = jnp.where(look_l, C.AGENT_ROTATE_RADIANS * dt,
                     jnp.where(look_r, -C.AGENT_ROTATE_RADIANS * dt, 0.0))
    yaw = agents.yaw + dyaw

    look_u = (action & C.ACTION_LOOK_UP) != 0
    look_d = (action & C.ACTION_LOOK_DOWN) != 0
    dpitch = jnp.where(
        look_u, C.AGENT_ROTATE_X_RADIANS * dt,
        jnp.where(look_d, -C.AGENT_ROTATE_X_RADIANS * dt * C.AGENT_LOOK_DOWN_FACTOR, 0.0),
    )
    pitch = jnp.clip(agents.pitch + dpitch, -vertical_limit, vertical_limit)
    return agents.replace(yaw=yaw, pitch=pitch)


def apply_acceleration(agents: AgentState, action: jax.Array, dt: float) -> AgentState:
    """Acceleration + jump from the action bitmask.

    Mirrors env.cpp:89-122 (direction selection, jump) and
    kcc.cpp setAcceleration:753-792 (ground/air acceleration model).
    """
    fwd = forward_dir(agents.yaw)
    left = strafe_left_dir(agents.yaw)

    a_fwd = ((action & C.ACTION_FORWARD) != 0).astype(jnp.float32) - jnp.where(
        (action & C.ACTION_FORWARD) == 0, ((action & C.ACTION_BACKWARD) != 0).astype(jnp.float32), 0.0
    )
    a_left = ((action & C.ACTION_LEFT) != 0).astype(jnp.float32) - jnp.where(
        (action & C.ACTION_LEFT) == 0, ((action & C.ACTION_RIGHT) != 0).astype(jnp.float32), 0.0
    )
    acc = fwd * a_fwd[..., None] + left * a_left[..., None]

    on_ground = agents.on_ground
    acc_mag = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    max_acc = jnp.where(on_ground, C.KCC_MAX_ACCELERATION, C.KCC_MAX_AIR_ACCELERATION)[..., None]
    acc = jnp.where(acc_mag > C.KCC_EPSILON, acc * max_acc / jnp.maximum(acc_mag, 1e-9), 0.0)

    hvel = agents.hvel
    # Ground branch: accelerate then enforce speed limit (kcc.cpp:764-781).
    g_vel = hvel + acc * dt
    g_speed = jnp.linalg.norm(g_vel, axis=-1)
    dv = C.KCC_OVERSPEED_DECELERATION * dt
    over = g_speed > C.KCC_MAX_HORIZONTAL_SPEED
    scale_hard = (g_speed - dv) / jnp.maximum(g_speed, 1e-9)
    scale_soft = C.KCC_MAX_HORIZONTAL_SPEED / jnp.maximum(g_speed, 1e-9)
    g_scale = jnp.where(over, jnp.where(g_speed - dv > C.KCC_MAX_HORIZONTAL_SPEED, scale_hard, scale_soft), 1.0)
    g_vel = g_vel * g_scale[..., None]

    # Air branch: only accept the new velocity if it stays under the air speed
    # cap or decreases speed (kcc.cpp:782-791).
    a_vel = hvel + acc * dt
    a_speed = jnp.linalg.norm(a_vel, axis=-1)
    cur_speed = jnp.linalg.norm(hvel, axis=-1)
    a_ok = (a_speed <= C.KCC_MAX_AIR_SPEED) | (a_speed < cur_speed)
    a_vel = jnp.where(a_ok[..., None], a_vel, hvel)

    hvel = jnp.where(on_ground[..., None], g_vel, a_vel)

    # Jump (env.cpp:120-121, agent.cpp:157-161).
    do_jump = ((action & C.ACTION_JUMP) != 0) & on_ground
    vvel = jnp.where(do_jump, C.KCC_JUMP_SPEED, agents.vvel)
    jumping = agents.jumping | do_jump

    return agents.replace(hvel=hvel, vvel=vvel, jumping=jumping)


# Neighbor cells considered by the horizontal sweep (the center's own cell is
# penetration-recovery territory, as in the reference's ghost overlap logic).
_SWEEP_CELLS = ((-1, -1), (-1, 0), (-1, 1), (0, -1),
                (0, 1), (1, -1), (1, 0), (1, 1))


def _sweep_horizontal(cfg: GridConfig, cols: jax.Array, pos: jax.Array,
                      dx: jax.Array, dz: jax.Array):
    """CIRCLE-exact first time-of-impact for the capsule translating by
    (dx, 0, dz).

    Axis-aligned specialization of the ghost-object convex sweep
    (kcc.cpp:360-364): in the horizontal plane the capsule is a circle of
    radius r, so sweeping vs solid voxel cells is a point sweep vs cells
    expanded by r with ROUNDED corners — entry faces are plane crossings and
    corner contacts are one quadratic each (|p0 + t d - corner| = r). With
    r + |d| < voxel_size (r=0.33, max 0.3 m/tick at 15 Hz) the swept circle
    stays inside the 3x3 cell block around the center's cell, so the 8
    neighbor cells are the complete candidate set. A circle already touching
    an expanded cell reports t=0 with the closest-feature normal, exactly
    like Bullet's blocked-at-start sweep (the slide then keeps the
    tangential component). Hits whose normal does not oppose the motion are
    discarded (the sweep callback's slope filter with up = -dir,
    kcc.cpp:52-93).

    Returns (t [0..1] fraction before impact, hit bool, nx, nz) where
    (nx, 0, nz) is the world contact normal of the earliest hit.

    `cols` is the packed solid-column bitmask grid (grid.pack_solid_columns).
    """
    r = HALF_XZ
    vs = cfg.voxel_size
    assert vs > r + C.KCC_MAX_HORIZONTAL_SPEED * C.DEFAULT_DT, (
        "3x3 sweep window requires voxel_size > r + max travel per tick")
    px = pos[..., 0]
    pz = pos[..., 2]
    bottom = pos[..., 1] - HALF_Y
    top = pos[..., 1] + HALF_Y
    ix = G.axis_index(cfg, 0, px)
    iz = G.axis_index(cfg, 2, pz)

    dx_safe = jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
    dz_safe = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)

    t_best = jnp.full(px.shape, jnp.inf)
    nx_best = jnp.zeros(px.shape)
    nz_best = jnp.zeros(px.shape)

    def consider(t_best, nx_best, nz_best, t, valid, nx, nz):
        better = valid & (t < t_best)
        return (jnp.where(better, t, t_best),
                jnp.where(better, nx, nx_best),
                jnp.where(better, nz, nz_best))

    for ox, oz in _SWEEP_CELLS:
        cix = ix + ox
        ciz = iz + oz
        solid = G.cols_cell_solid(cfg, cols, cix, ciz, bottom, top)
        cx0 = cfg.origin[0] + cix.astype(jnp.float32) * vs
        cx1 = cx0 + vs
        cz0 = cfg.origin[2] + ciz.astype(jnp.float32) * vs
        cz1 = cz0 + vs

        # blocked-at-start: circle already touches the expanded cell
        ex = px - jnp.clip(px, cx0, cx1)
        ez = pz - jnp.clip(pz, cz0, cz1)
        d2 = ex * ex + ez * ez
        dlen = jnp.sqrt(jnp.maximum(d2, 1e-24))
        degen = d2 < 1e-12
        # degenerate exact-boundary touch: push straight back toward center
        onorm = 1.0 / math.sqrt(ox * ox + oz * oz)
        tnx = jnp.where(degen, -ox * onorm, ex / dlen)
        tnz = jnp.where(degen, -oz * onorm, ez / dlen)
        touch = solid & (d2 <= r * r) & (tnx * dx + tnz * dz <= 0.0)
        t_best, nx_best, nz_best = consider(
            t_best, nx_best, nz_best, jnp.zeros_like(px), touch, tnx, tnz)

        # entry-face crossings (plane at face -/+ r; contact point must lie
        # on the flat section of the expanded cell)
        face_x = jnp.where(dx > 0, cx0 - r, cx1 + r)
        t_fx = (face_x - px) / dx_safe
        z_at = pz + t_fx * dz
        v_fx = (solid & (jnp.abs(dx) > 1e-9) & (t_fx >= 0.0) & (t_fx <= 1.0)
                & (z_at >= cz0) & (z_at <= cz1))
        n_fx = jnp.where(dx > 0, -1.0, 1.0)
        t_best, nx_best, nz_best = consider(
            t_best, nx_best, nz_best, t_fx, v_fx, n_fx, jnp.zeros_like(px))

        face_z = jnp.where(dz > 0, cz0 - r, cz1 + r)
        t_fz = (face_z - pz) / dz_safe
        x_at = px + t_fz * dx
        v_fz = (solid & (jnp.abs(dz) > 1e-9) & (t_fz >= 0.0) & (t_fz <= 1.0)
                & (x_at >= cx0) & (x_at <= cx1))
        n_fz = jnp.where(dz > 0, -1.0, 1.0)
        t_best, nx_best, nz_best = consider(
            t_best, nx_best, nz_best, t_fz, v_fz, jnp.zeros_like(px), n_fz)

        # corner arcs: |p0 + t d - corner| = r, entry root; valid only in the
        # corner's Voronoi region (point outside the cell on both axes)
        a = dx * dx + dz * dz
        a_safe = jnp.maximum(a, 1e-12)
        for cx, x_is_lo in ((cx0, True), (cx1, False)):
            for cz, z_is_lo in ((cz0, True), (cz1, False)):
                rx = px - cx
                rz = pz - cz
                b = 2.0 * (rx * dx + rz * dz)
                c0 = rx * rx + rz * rz - r * r
                disc = b * b - 4.0 * a_safe * c0
                t_c = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a_safe)
                xo = px + t_c * dx
                zo = pz + t_c * dz
                out_x = (xo <= cx0) if x_is_lo else (xo >= cx1)
                out_z = (zo <= cz0) if z_is_lo else (zo >= cz1)
                v_c = (solid & (a > 1e-12) & (disc >= 0.0) & (b < 0.0)
                       & (t_c >= 0.0) & (t_c <= 1.0) & out_x & out_z)
                t_best, nx_best, nz_best = consider(
                    t_best, nx_best, nz_best, t_c, v_c,
                    (rx + t_c * dx) / r, (rz + t_c * dz) / r)

    hit = jnp.isfinite(t_best)
    t = jnp.where(hit, t_best, 1.0)
    return t, hit, nx_best, nz_best


def _slide_horizontal(cfg: GridConfig, cols: jax.Array, pos: jax.Array,
                      dx: jax.Array, dz: jax.Array) -> jax.Array:
    """stepForwardAndStrafe (kcc.cpp:337-393): bounded-iteration sweep-and-
    slide with the Quake2 stop rule.

    Mirrors the reference loop structure: each iteration sweeps the CURRENT
    displacement from the ORIGINAL position; on impact the parallel component
    is truncated at the hit fraction (updateTargetPositionBasedOnCollision,
    kcc.cpp:313-329: target = current + perp*L + parallel*L*f) and the
    perpendicular component kept in full; movement is cancelled outright when
    the re-targeted displacement is ~zero (<= 1 cm, distance2 <= 0.0001) or
    opposes the original velocity. Axis-aligned faces converge in <= 3
    sweeps (x wall, z wall, then clear); one extra masked iteration absorbs
    corner-arc re-contacts, so 4 replace the reference's <= 10.
    """
    odx, odz = dx, dz
    active = (jnp.abs(dx) + jnp.abs(dz)) > 0.0
    for _ in range(4):
        t, hit, nx, nz = _sweep_horizontal(cfg, cols, pos, dx, dz)
        hit = hit & active
        # updateTargetPositionBasedOnCollision (kcc.cpp:313-329): the
        # component of the displacement ALONG the contact normal is truncated
        # at the impact fraction (backed off by the clamp margin — the ghost
        # sweep's allowedCcdPenetration analogue); the perpendicular
        # component is kept in full. For axis normals this reduces to the
        # per-axis clip; corner-arc hits get the exact diagonal normal.
        ndot = nx * dx + nz * dz                 # <= 0 for blocking hits
        par_new = jnp.minimum(ndot * t + CLAMP_MARGIN, 0.0)
        ndx = jnp.where(hit, dx - nx * (ndot - par_new), dx)
        ndz = jnp.where(hit, dz - nz * (ndot - par_new), dz)
        l2 = ndx * ndx + ndz * ndz
        cancel = hit & ((l2 <= 1e-4) | (ndx * odx + ndz * odz <= 0.0))
        dx = jnp.where(cancel, 0.0, ndx)
        dz = jnp.where(cancel, 0.0, ndz)
        active = active & hit & ~cancel
    return pos.at[..., 0].add(dx).at[..., 2].add(dz)


def player_step(
    cfg: GridConfig,
    vtype: jax.Array,
    agents: AgentState,
    dt: float,
    cols: jax.Array = None,
    obbs: jax.Array = None,
) -> AgentState:
    """One physics tick for all agents (ref playerStep, kcc.cpp:528-602).

    `cols` (grid.pack_solid_columns(cfg, vtype)) may be passed in to share
    the packed solid-column grid across physics calls in one env step.
    `obbs` [W, 7] adds exact y-rotated wall boxes (hex mazes) to the world:
    horizontal blocking via capsule-vs-OBB push-out after the grid slide
    (the momentum arrest then sees the corrected travel, like the
    reference's in-sweep wall hits) and landing support from wall tops in
    the stepDown phase."""
    if cols is None:
        cols = G.pack_solid_columns(cfg, vtype)
    pos0 = agents.pos
    was_on_ground = agents.on_ground

    # Gravity + velocity clamps (kcc.cpp:556-562).
    vvel = agents.vvel - C.KCC_GRAVITY * dt
    vvel = jnp.minimum(vvel, C.KCC_JUMP_SPEED)
    vvel = jnp.maximum(vvel, -C.KCC_FALL_SPEED)
    voffset = vvel * dt

    pos = pos0
    top = pos[..., 1] + HALF_Y
    x0 = pos[..., 0] - HALF_XZ
    x1 = pos[..., 0] + HALF_XZ
    z0 = pos[..., 2] - HALF_XZ
    z1 = pos[..., 2] + HALF_XZ

    # --- stepUp (kcc.cpp:223-304) ---
    step_h = jnp.where(vvel < 0, C.KCC_STEP_HEIGHT, 0.0)
    up_dist = step_h + jnp.maximum(voffset, 0.0)
    # capsule-exact ceiling: the TOP sphere contacts a cell's underside at
    # cell_bottom + (r - sqrt(r^2 - d^2)) per column, and columns past the
    # 45-degree contact filter never block (grid.cols_capsule_ceiling_above)
    ceil_y, ceil_found = G.cols_capsule_ceiling_above(
        cfg, cols, pos[..., 0], pos[..., 2], top, MAX_RISE, _span_xz(cfg),
        HALF_XZ,
    )
    free_rise = jnp.where(ceil_found, jnp.maximum(ceil_y - top - CLAMP_MARGIN, 0.0), jnp.inf)
    blocked_up = free_rise < up_dist
    rise = jnp.minimum(up_dist, free_rise)
    pos = pos.at[..., 1].add(rise)

    # step offset bookkeeping (kcc.cpp:264-303)
    frac = rise / jnp.maximum(up_dist, 1e-9)
    step_offset = jnp.where(
        blocked_up,
        jnp.where(voffset > 0, C.KCC_STEP_HEIGHT, step_h * frac),
        step_h,
    )
    hit_ceiling_rising = blocked_up & (voffset > 0)
    vvel = jnp.where(hit_ceiling_rising, 0.0, vvel)
    voffset = jnp.where(hit_ceiling_rising, 0.0, voffset)

    # --- stepForwardAndStrafe (kcc.cpp:337-393), iterative sweep-slide ---
    pre_slide = pos
    pos = _slide_horizontal(cfg, cols, pos,
                            agents.hvel[..., 0] * dt, agents.hvel[..., 2] * dt)
    if obbs is not None:
        pos = _obb_push_xz(pos, obbs, pre_slide)

    # --- stepDown (kcc.cpp:400-442) ---
    down_vel = jnp.where(vvel < 0, -vvel, 0.0)
    clamp_fall = (down_vel > 0) & (down_vel > C.KCC_FALL_SPEED) & (was_on_ground | ~agents.jumping)
    down_vel = jnp.where(clamp_fall, C.KCC_FALL_SPEED, down_vel)
    drop = step_offset + down_vel * dt

    bottom = pos[..., 1] - HALF_Y
    # capsule-exact landing: the bottom SPHERE rests dip(d) below a cell's
    # top at horizontal distance d, and slips off past the 45-degree contact
    # filter (grid.cols_capsule_floor_below — reproduces the reference's
    # ledge-edge dip, golden trace ledge_fall)
    floor_y, floor_found = G.cols_capsule_floor_below(
        cfg, cols, pos[..., 0], pos[..., 2],
        bottom, MAX_DROP, _span_xz(cfg), HALF_XZ,
    )
    if obbs is not None:
        # wall tops are floor candidates too (landing on maze walls)
        otop, ofound = obb_floor_support(pos, obbs)
        ok = ofound & (otop <= bottom + CLAMP_MARGIN)
        better = ok & (~floor_found | (otop > floor_y))
        floor_y = jnp.where(better, otop, floor_y)
        floor_found = floor_found | ok
    # Land if a floor top lies within the drop distance below (or at) the capsule
    # bottom.
    land = floor_found & (floor_y >= bottom - drop)
    new_bottom = jnp.where(land, floor_y, bottom - drop)
    pos = pos.at[..., 1].set(new_bottom + HALF_Y)

    vvel = jnp.where(land, 0.0, vvel)
    voffset = jnp.where(land, 0.0, voffset)
    jumping = jnp.where(land, False, agents.jumping)

    # Momentum arrest: actual horizontal travel (kcc.cpp:576-578).
    hvel = (pos - pos0) / dt
    hvel = hvel.at[..., 1].set(0.0)

    # onGround per ref semantics (kcc.cpp:679-682): vvel and voffset both ~0.
    on_ground = (jnp.abs(vvel) < C.KCC_EPSILON) & (jnp.abs(voffset) < C.KCC_EPSILON)

    # Ground friction (kcc.cpp:592-599).
    speed = jnp.linalg.norm(hvel, axis=-1)
    fric_scale = jnp.maximum(speed - C.KCC_NORMAL_DECELERATION * dt, 0.0) / jnp.maximum(speed, 1e-9)
    hvel = jnp.where(on_ground[..., None], hvel * fric_scale[..., None], hvel)

    return agents.replace(pos=pos, vvel=vvel, hvel=hvel, jumping=jumping, on_ground=on_ground)


def _obb_local_xz(pos, obbs):
    """World XZ -> per-wall local (u: along length, v: along thickness).

    pos [..., 3], obbs [W, 7] (cx, cy, cz, hx, hy, hz, yaw) ->
    (u, v) each [..., W]. Same rotation convention as the renderer's
    PRIM_ROTBOX (ops/raycast_pallas.prim_rotbox) and the reference's
    layoutBox.rotateY (component_hexagonal_maze.cpp:107)."""
    cy_ = jnp.cos(obbs[:, 6])
    sy_ = jnp.sin(obbs[:, 6])
    ox = pos[..., 0:1] - obbs[:, 0]
    oz = pos[..., 2:3] - obbs[:, 2]
    u = cy_ * ox - sy_ * oz
    v = sy_ * ox + cy_ * oz
    return u, v


def resolve_obb_walls(agents: AgentState, obbs: jax.Array,
                      prev_pos: jax.Array = None,
                      iters: int = 3, dt: float = C.DEFAULT_DT) -> AgentState:
    """Exact capsule-vs-rotated-wall horizontal collision.

    The reference collides agents with y-rotated Bullet boxes for hex-maze
    walls (component_hexagonal_maze.cpp:79-113 — ONLY the main wall box gets
    a RigidBody; landmarks and edging are drawables). Here the walls are
    resolved analytically AFTER the axis-aligned grid sweep: per iteration
    each agent is pushed out of its deepest-penetrating wall along the
    capsule(circle r)-vs-rectangle contact normal, which reproduces the
    sweep-slide's tangential behavior for one-tick displacements.

    obbs [W, 7] rows (cx, cy, cz, hx, hy, hz, yaw); dead rows: hy < 0 (any
    row whose vertical span cannot overlap is inert). `prev_pos` (positions
    before the horizontal move) disambiguates the push side when a fast
    perpendicular step carries the center past the wall midplane (wall
    thickness 0.3 vs max 0.3 m/tick)."""
    if obbs.shape[0] == 0:
        return agents
    if prev_pos is None:
        prev_pos = agents.pos
    pos = _obb_push_xz(agents.pos, obbs, prev_pos, iters)
    moved = jnp.any(jnp.abs(pos - agents.pos) > 0, axis=-1)
    # a wall stop arrests the horizontal momentum the same way playerStep
    # derives it from actual travel (kcc.cpp:576-578): fold the push into
    # the tick's displacement-velocity
    delta = (pos - agents.pos) / dt
    hvel = (agents.hvel + delta).at[..., 1].set(0.0)
    hvel = jnp.where(moved[..., None], hvel, agents.hvel)
    return agents.replace(pos=pos, hvel=hvel)


def _obb_push_xz(pos: jax.Array, obbs: jax.Array, prev_pos: jax.Array,
                 iters: int = 3) -> jax.Array:
    """Positional core of resolve_obb_walls: push capsule centers out of
    rotated walls (deepest wall per iteration). Used directly inside
    player_step so the final momentum arrest sees the corrected travel."""
    r = HALF_XZ
    _, v_prev = _obb_local_xz(prev_pos, obbs)           # [A, W]
    side_prev = jnp.where(v_prev >= 0, 1.0, -1.0)

    for _ in range(iters):
        u, v = _obb_local_xz(pos, obbs)
        hx, hy = obbs[:, 3], obbs[:, 4]
        hv = obbs[:, 5]
        bottom = pos[..., 1:2] - HALF_Y
        top = pos[..., 1:2] + HALF_Y
        v_overlap = (bottom < obbs[:, 1] + hy) & (top > obbs[:, 1] - hy)

        cu = jnp.clip(u, -hx, hx)
        cv = jnp.clip(v, -hv, hv)
        du = u - cu
        dv = v - cv
        dist = jnp.sqrt(du * du + dv * dv)
        inside = (jnp.abs(u) <= hx) & (jnp.abs(v) <= hv)
        pen_out = jnp.maximum(r - dist, 0.0)            # outside-rect case
        pen_in = hv + r - side_prev * v                 # crossed/inside case
        pen = jnp.where(inside, pen_in, pen_out)
        pen = jnp.where(v_overlap & (hy > 0), pen, 0.0)  # [A, W]

        w = jnp.argmax(pen, axis=-1)                    # deepest wall per agent
        p = jnp.take_along_axis(pen, w[..., None], axis=-1)[..., 0]
        live = p > 1e-6
        aw = lambda x: jnp.take_along_axis(x, w[..., None], axis=-1)[..., 0]
        # contact normal in wall frame
        d_safe = jnp.maximum(aw(dist), 1e-9)
        nu = jnp.where(aw(inside), 0.0, aw(du) / d_safe)
        nv = jnp.where(aw(inside), aw(side_prev), aw(dv) / d_safe)
        # degenerate exact-touch: push along prev side of the thickness axis
        degen = (~aw(inside)) & (aw(dist) < 1e-9)
        nu = jnp.where(degen, 0.0, nu)
        nv = jnp.where(degen, aw(side_prev), nv)
        cyw = jnp.cos(obbs[:, 6])[w]
        syw = jnp.sin(obbs[:, 6])[w]
        px = cyw * nu + syw * nv
        pz = -syw * nu + cyw * nv
        push = jnp.stack([px, jnp.zeros_like(px), pz], axis=-1)
        pos = pos + jnp.where(live[..., None], push * p[..., None], 0.0)
    return pos


def obb_floor_support(pos_xz_y, obbs):
    """Highest wall-top floor candidate under each agent.

    pos_xz_y [..., 3] (capsule centers), obbs [W, 7] ->
    (top_y [...], found [...]): the max cy+hy over walls whose rectangle is
    within the capsule radius horizontally. The stepDown phase combines this
    with the voxel-grid floor scan so agents can LAND ON and stand on maze
    walls, exactly as Bullet's capsule-vs-box sweep allows (jump apex 1.2 m
    clears the 0.85-1.4 m walls)."""
    if obbs.shape[0] == 0:
        z = jnp.zeros(pos_xz_y.shape[:-1], jnp.float32)
        return z, jnp.zeros(pos_xz_y.shape[:-1], bool)
    r = HALF_XZ
    u, v = _obb_local_xz(pos_xz_y, obbs)
    du = u - jnp.clip(u, -obbs[:, 3], obbs[:, 3])
    dv = v - jnp.clip(v, -obbs[:, 5], obbs[:, 5])
    d2 = du * du + dv * dv
    # same capsule contact model as the voxel floor scan: the bottom sphere
    # rests dip(d) below the wall top, and slips off past the 45-degree
    # contact filter (d <= r*sin(45))
    d_max2 = 0.5 * r * r
    near = (d2 <= d_max2) & (obbs[:, 4] > 0)
    dip = r - jnp.sqrt(jnp.maximum(r * r - d2, 0.0))
    top = obbs[:, 1] + obbs[:, 4] - dip
    best = jnp.max(jnp.where(near, top, -jnp.inf), axis=-1)
    return best, jnp.isfinite(best)


def resolve_agent_collisions(agents: AgentState, cfg: GridConfig = None,
                             vtype: jax.Array = None,
                             cols: jax.Array = None,
                             obbs: jax.Array = None) -> AgentState:
    """Pairwise capsule-capsule horizontal push-out.

    Replaces agent-vs-agent sweep collisions + penetration recovery
    (agents are in each other's collision masks, agent.cpp:63;
    recoverFromPenetration kcc.cpp:156-221). Symmetric positional correction;
    when the grid is provided, the push is applied through the same sweep as
    walking, so an agent shoved toward a wall stops at the wall instead of
    being pushed inside it (recoverFromPenetration re-checks the world,
    kcc.cpp:156-221).
    """
    pos = agents.pos
    num_agents = pos.shape[0]
    if num_agents <= 1:
        return agents

    diff = pos[:, None, :] - pos[None, :, :]  # [A, A, 3]
    d_xz = jnp.sqrt(diff[..., 0] ** 2 + diff[..., 2] ** 2 + 1e-12)
    v_overlap = jnp.abs(diff[..., 1]) < 2 * HALF_Y - 0.05
    eye = jnp.eye(num_agents, dtype=bool)
    overlap = (~eye) & v_overlap & (d_xz < 2 * HALF_XZ)

    push_mag = jnp.where(overlap, (2 * HALF_XZ - d_xz) * 0.5, 0.0)
    dir_xz = jnp.stack([diff[..., 0], jnp.zeros_like(d_xz), diff[..., 2]], -1) / d_xz[..., None]
    # Degenerate case: coincident centers -> push along +x deterministically.
    degen = overlap & (d_xz < 1e-5)
    dir_xz = jnp.where(degen[..., None], jnp.array([1.0, 0.0, 0.0]), dir_xz)
    push = jnp.sum(push_mag[..., None] * dir_xz, axis=1)  # [A, 3]
    if cfg is None or (vtype is None and cols is None):
        return agents.replace(pos=pos + push)
    if cols is None:
        cols = G.pack_solid_columns(cfg, vtype)
    new_pos = _slide_horizontal(cfg, cols, pos, push[..., 0], push[..., 2])
    if obbs is not None:
        new_pos = _obb_push_xz(new_pos, obbs, pos)
    return agents.replace(pos=new_pos)
