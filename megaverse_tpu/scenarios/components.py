"""Device-side reusable scenario components.

Branch-free batched reimplementations of the reference ScenarioComponents:

- object stacking (pick up / place movable objects with Interact):
  scenarios/include/scenarios/component_object_stacking.hpp:28-206. Object
  pointers become integer prop indices: the grid field `vobj` holds
  (prop index + 1) per voxel, and AgentState.carried holds the carried prop.
- fall detection (teleport fallen agents back):
  scenarios/include/scenarios/component_fall_detection.hpp:16-62.

All functions operate on ONE environment (agents batched on the leading axis)
and are vmapped at the vector-env level.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from megaverse_tpu import constants as C
from megaverse_tpu.ops import grid as G
from megaverse_tpu.types import (
    EnvState,
    GridConfig,
    PROP_FLAG_SOLID,
)

CARRYING_SCALE = 0.78  # component_object_stacking.hpp:63


def rot_yaw_pitch(yaw, pitch, v):
    """R_y(yaw) @ R_x(pitch) @ v for a constant local vector v (len-3)."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    y1 = cp * v[1] - sp * v[2]
    z1 = sp * v[1] + cp * v[2]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    x2 = cy * v[0] + sy * z1
    z2 = -sy * v[0] + cy * z1
    return jnp.stack([x2, y1, z2], axis=-1)


def camera_anchor(agents, local: Tuple[float, float, float]) -> jax.Array:
    """World position of a camera-frame anchor for each agent [A,3].

    Mirrors the scene-graph chain agent -> cameraObject(+0.41, pitch) -> child
    (agent.cpp:28-40); the agent visual origin sits +0.05 above the capsule
    center (agent.cpp:95).
    """
    base = agents.pos + jnp.asarray(
        [0.0, C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y, 0.0], jnp.float32
    )
    return base + rot_yaw_pitch(agents.yaw, agents.pitch, jnp.asarray(local, jnp.float32))


def pickup_spot(agents) -> jax.Array:
    """Interact anchor (0,-0.44,-1) camera-local (agent.cpp:40)."""
    return camera_anchor(agents, C.AGENT_PICKUP_SPOT)


def carry_anchor(agents) -> jax.Array:
    """Carried-object position: pickup spot + (0,-0.3,0) local
    (component_object_stacking.hpp:117-121)."""
    p = C.AGENT_PICKUP_SPOT
    return camera_anchor(agents, (p[0], p[1] - 0.3, p[2]))


def update_carried_props(state: EnvState) -> EnvState:
    """Move carried props to their carry anchors (parenting replacement).

    In the reference the carried object is a scene-graph child of the pickup
    spot; here we write its world position each tick after physics.
    """
    carried = state.agents.carried  # [A] int, -1 = none
    anchors = carry_anchor(state.agents)  # [A, 3]
    has = carried >= 0
    idx = jnp.maximum(carried, 0).astype(jnp.int32)
    pos = state.props.pos
    new_pos = pos.at[idx].set(jnp.where(has[:, None], anchors, pos[idx]))
    return state.replace(props=state.props.replace(pos=new_pos))


class StackingResult(NamedTuple):
    state: EnvState
    picked: jax.Array       # bool [A] picked an object this tick
    placed: jax.Array       # bool [A] placed an object this tick
    place_voxel: jax.Array  # int32 [A, 3] voxel where placed (valid if placed)


def object_stacking_step(
    cfg: GridConfig,
    state: EnvState,
    action: jax.Array,
    can_place: Optional[Callable[[EnvState, jax.Array, jax.Array], jax.Array]] = None,
    max_drop_scan: int = 16,
) -> StackingResult:
    """Interact handling: place carried object / pick up facing object.

    Mirrors ObjectStackingComponent::onInteractAction
    (component_object_stacking.hpp:59-167). Multi-agent ticks are processed
    SEQUENTIALLY in agent order, exactly like the reference's per-agent
    loop: agent i's placement/pick mutates the world state agent i+1 then
    queries within the same tick (an unrolled loop of per-agent passes —
    each pass's array work is [A]-sized scalars/gathers, so the cost is
    A x tiny). Single-agent envs take the one-pass path directly.

    can_place(state, agent_idx_arange, voxel [A,3]) -> bool [A] optional hook
    (ref canPlaceObject callback).
    """
    num_agents = state.agents.pos.shape[0]
    if num_agents == 1:
        return _stacking_pass(cfg, state, action, can_place, max_drop_scan)

    picked = jnp.zeros((num_agents,), bool)
    placed = jnp.zeros((num_agents,), bool)
    place_voxel = jnp.zeros((num_agents, 3), jnp.int32)
    idx = jnp.arange(num_agents)
    for a in range(num_agents):
        # only agent a interacts in this pass (the conflict-resolution
        # matrices inside the pass become no-ops)
        act_a = jnp.where(idx == a, action,
                          action & ~jnp.int32(C.ACTION_INTERACT))
        res = _stacking_pass(cfg, state, act_a, can_place, max_drop_scan)
        state = res.state
        picked = picked | res.picked
        placed = placed | res.placed
        place_voxel = jnp.where(res.placed[:, None], res.place_voxel,
                                place_voxel)
    return StackingResult(state, picked, placed, place_voxel)


def _stacking_pass(
    cfg: GridConfig,
    state: EnvState,
    action: jax.Array,
    can_place: Optional[Callable[[EnvState, jax.Array, jax.Array], jax.Array]] = None,
    max_drop_scan: int = 16,
) -> StackingResult:
    agents = state.agents
    num_agents = agents.pos.shape[0]
    interact = (action & C.ACTION_INTERACT) != 0

    # ---------------- place branch (carrying something) --------------------
    carrying = agents.carried >= 0
    want_place = interact & carrying
    cidx = jnp.maximum(agents.carried, 0).astype(jnp.int32)

    obj_pos = state.props.pos[cidx]  # [A,3] carried object position
    place_voxel = G.world_to_voxel(cfg, obj_pos)  # [A,3]

    solid_pv = G.solid_from_cols(cfg, state.cols, place_voxel)
    vo = G.gather_voxel(cfg, state.vobj, place_voxel)
    in_grid = jnp.all(
        (place_voxel >= 0) & (place_voxel < jnp.asarray(cfg.dims)), axis=-1
    )
    # "empty": not solid and no object (hpp:96). Out-of-grid counts as empty in
    # the reference (sparse grid); we require in-grid so the object table and
    # grid stay consistent.
    voxel_empty = ~solid_pv & (vo == 0) & in_grid

    # No agent standing in that voxel (hpp:82-94; compares agent voxel coords).
    agent_voxels = G.world_to_voxel(cfg, agents.pos + jnp.asarray([0.0, C.AGENT_BODY_OFFSET_Y, 0.0]))
    same = jnp.all(place_voxel[:, None, :] == agent_voxels[None, :, :], axis=-1)
    other = ~jnp.eye(num_agents, dtype=bool)
    collides_agent = jnp.any(same & other, axis=1)

    ok_place = want_place & voxel_empty & ~collides_agent
    if can_place is not None:
        ok_place = ok_place & can_place(state, jnp.arange(num_agents), place_voxel)

    # Gravity settle: descend while the voxel below is non-solid and has no
    # object (hpp:101-115), bounded scan.
    def settle_body(_, voxel):
        below = voxel - jnp.asarray([0, 1, 0])
        bs = G.solid_from_cols(cfg, state.cols, below)
        bo = G.gather_voxel(cfg, state.vobj, below)
        support = bs | (bo != 0) | (below[..., 1] < 0)
        return jnp.where(support[..., None], voxel, below)

    settled = place_voxel
    for _ in range(max_drop_scan):
        settled = settle_body(None, settled)

    # Resolve conflicts: two agents placing into the same settled voxel ->
    # lowest index wins.
    same_target = jnp.all(settled[:, None, :] == settled[None, :, :], axis=-1)
    earlier = jnp.tril(jnp.ones((num_agents, num_agents), bool), k=-1)
    conflict = jnp.any(same_target & earlier & ok_place[None, :], axis=1)
    ok_place = ok_place & ~conflict

    # Apply placements.
    center = G.voxel_center(cfg, settled)
    props = state.props
    pp = props.pos.at[cidx].set(jnp.where(ok_place[:, None], center, props.pos[cidx]))
    ps = props.scale.at[cidx].set(
        jnp.where(ok_place[:, None], props.scale[cidx] / CARRYING_SCALE, props.scale[cidx])
    )
    pf = props.flags.at[cidx].set(
        jnp.where(ok_place, props.flags[cidx] | PROP_FLAG_SOLID, props.flags[cidx])
    )
    # masked coords (-1 -> dropped): only the winning rows scatter, so a
    # losing row can never race a winner at a shared cell
    vobj = G.set_voxel(
        cfg, state.vobj, jnp.where(ok_place[:, None], settled, -1),
        (cidx + 1).astype(state.vobj.dtype),
    )
    # masked coords (-1 -> dropped) so losing agents never scatter at all
    cols = G.update_cols(
        cfg, state.cols, jnp.where(ok_place[:, None], settled, -1), True)
    carried = jnp.where(ok_place, jnp.asarray(-1, agents.carried.dtype), agents.carried)

    state = state.replace(
        cols=cols, vobj=vobj,
        props=props.replace(pos=pp, scale=ps, flags=pf),
        agents=agents.replace(carried=carried),
    )

    # ---------------- pick branch (empty-handed) ---------------------------
    want_pick = interact & ~carrying
    spot = pickup_spot(state.agents)
    v0 = G.world_to_voxel(cfg, spot)

    picked = jnp.zeros((num_agents,), bool)
    pick_idx = jnp.zeros((num_agents,), jnp.int32)
    pick_voxel = v0
    # Scan up to 2 voxels upward (pickupHeight <= 1, hpp:137-141): pick the
    # first voxel containing an object with nothing stacked on top.
    for h in range(2):
        voxel = v0 + jnp.asarray([0, h, 0])
        above = voxel + jnp.asarray([0, 1, 0])
        vo = G.gather_voxel(cfg, state.vobj, voxel)
        va = G.gather_voxel(cfg, state.vobj, above)
        hit = want_pick & ~picked & (vo != 0) & (va == 0)
        pick_idx = jnp.where(hit, vo.astype(jnp.int32) - 1, pick_idx)
        pick_voxel = jnp.where(hit[:, None], voxel, pick_voxel)
        picked = picked | hit

    # Conflict resolution: same object targeted by several agents -> lowest
    # agent index wins.
    same_obj = pick_idx[:, None] == pick_idx[None, :]
    earlier = jnp.tril(jnp.ones((num_agents, num_agents), bool), k=-1)
    lost = jnp.any(same_obj & earlier & picked[None, :], axis=1) & picked
    picked = picked & ~lost

    props = state.props
    ps = props.scale.at[pick_idx].set(
        jnp.where(picked[:, None], props.scale[pick_idx] * CARRYING_SCALE, props.scale[pick_idx])
    )
    pf = props.flags.at[pick_idx].set(
        jnp.where(picked, props.flags[pick_idx] & ~jnp.uint8(PROP_FLAG_SOLID), props.flags[pick_idx])
    )
    vobj = G.set_voxel(
        cfg, state.vobj, jnp.where(picked[:, None], pick_voxel, -1),
        jnp.zeros((), state.vobj.dtype),
    )
    cols = G.update_cols(
        cfg, state.cols, jnp.where(picked[:, None], pick_voxel, -1), False)
    carried = jnp.where(picked, pick_idx.astype(state.agents.carried.dtype), state.agents.carried)

    state = state.replace(
        cols=cols, vobj=vobj,
        props=props.replace(scale=ps, flags=pf),
        agents=state.agents.replace(carried=carried),
    )
    state = update_carried_props(state)

    return StackingResult(state, picked, ok_place, settled)


def fall_detection_step(
    cfg: GridConfig,
    state: EnvState,
    fall_threshold: float = -20.0,
    max_up_scan: int = 16,
) -> Tuple[EnvState, jax.Array]:
    """Teleport agents below `fall_threshold` back above their spawn position.

    Mirrors FallDetectionComponent::step/resetAgent
    (component_fall_detection.hpp:33-62): the respawn voxel climbs up from the
    initial position while occupied. Returns (state, fell_mask [A]).
    """
    agents = state.agents
    visual_y = agents.pos[..., 1] + C.AGENT_BODY_OFFSET_Y
    fell = visual_y < fall_threshold

    # Initial position -> voxel; climb while non-empty. The packed column
    # words hold the whole Y range, so one two-word gather + count-trailing-
    # ones replaces max_up_scan sequential gathers (bit-exact vs the loop;
    # test_grid.py::test_first_free_above_matches_loop).
    start = agents.spawn_pos - jnp.asarray([0.0, C.AGENT_HEIGHT, 0.0])  # pre-offset spawn
    voxel = G.first_free_above(cfg, state.cols, G.world_to_voxel(cfg, start),
                               max_scan=max_up_scan)

    # teleport: warp (kcc.cpp:509-517) zeroes velocities. The reference
    # teleports to the voxel center and lets penetration recovery push the
    # capsule up; we place the capsule bottom directly on the voxel floor.
    target = G.voxel_center(cfg, voxel)
    target = target.at[..., 1].set(
        target[..., 1] - 0.5 * cfg.voxel_size + C.AGENT_HALF_HEIGHT + 0.01
    )
    new_pos = jnp.where(fell[:, None], target, agents.pos)
    agents = agents.replace(
        pos=new_pos,
        hvel=jnp.where(fell[:, None], 0.0, agents.hvel),
        vvel=jnp.where(fell, 0.0, agents.vvel),
    )
    return state.replace(agents=agents), fell
