"""Core pytree types for megaverse_tpu.

The reference engine's mutable OO scene (Env::EnvState, env.hpp:124-170) becomes a
single immutable pytree `EnvState`; one simulated world == one unbatched EnvState,
and the batch dimension is added with `jax.vmap` (replacing the reference VectorEnv
thread pool, vector_env.cpp:6-127).

Static (compile-time) configuration lives in frozen dataclasses (`GridConfig`,
`EnvConfig`); everything dynamic is a JAX array.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from megaverse_tpu import constants as C


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Static dense voxel-grid geometry for a scenario.

    Replaces the reference sparse hash grid (util/voxel_grid.hpp:57-165) with a
    fixed-shape dense array suited to XLA. `origin` is the world coordinate of the
    min corner of voxel (0,0,0); world->voxel is floor((p - origin) / voxel_size)
    (ref voxel_grid.hpp:144-149).
    """

    dims: Tuple[int, int, int]
    voxel_size: float = 1.0
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def world_min(self):
        return jnp.asarray(self.origin, jnp.float32)

    @property
    def world_max(self):
        return jnp.asarray(
            [o + d * self.voxel_size for o, d in zip(self.origin, self.dims)], jnp.float32
        )


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration resolved at trace time.

    FloatParams (ref env.hpp:85, scenario.hpp:225-242) are fixed at env
    construction in the reference, so they are static here; only reward shaping is
    runtime-mutable (scenario.hpp:209-215) and is therefore carried as arrays.
    """

    scenario_name: str
    num_agents: int
    grid: GridConfig
    max_props: int
    params: Mapping[str, float]  # fully-resolved float params
    dt: float = C.DEFAULT_DT
    obs_width: int = C.OBS_WIDTH
    obs_height: int = C.OBS_HEIGHT
    # Typed prop-table layout: ((ptype, start, cap), ...). Empty = one untyped
    # region of max_props rows (renderer tests every primitive kind per row).
    prop_segments: Tuple[Tuple[int, int, int], ...] = ()
    # Whether device-side scenario logic reads these grids; when False they
    # ship as (1,1,1) placeholders (the auto-reset select streams every grid
    # through HBM each step).
    needs_terrain_grid: bool = False
    needs_object_grid: bool = False

    def param(self, name: str) -> float:
        return float(self.params[name])


class PropState(struct.PyTreeNode):
    """Fixed-size table of drawable/collidable objects ("props").

    Replaces the reference scene-graph drawables (DrawablesMap, env.hpp:72-87).
    A prop with type == PROP_NONE is an unused slot. `scale` holds per-axis
    half-extents for boxes and per-axis radii for quadrics. A negative y-scale on
    a cone means "flipped" (used for diamond bottom halves,
    layout_utils.cpp addDiamond).
    """

    type: jax.Array   # int8  [P]
    pos: jax.Array    # f32   [P,3] world-space center
    scale: jax.Array  # f32   [P,3]
    yaw: jax.Array    # f32   [P] rotation about +Y (used by PROP_ROTBOX)
    color: jax.Array  # uint8 [P] palette index
    # secondary palette index: PROP_ROTBOX_WALL's bottom-edging color
    color2: jax.Array  # uint8 [P]
    # bit0: solid (blocks agents), bit1: visible, bit2: interactable/movable
    flags: jax.Array  # uint8 [P]

    @staticmethod
    def empty(max_props: int) -> "PropState":
        p = max_props
        return PropState(
            type=jnp.full((p,), C.PROP_NONE, jnp.int8),
            pos=jnp.zeros((p, 3), jnp.float32),
            scale=jnp.zeros((p, 3), jnp.float32),
            yaw=jnp.zeros((p,), jnp.float32),
            color=jnp.zeros((p,), jnp.uint8),
            color2=jnp.zeros((p,), jnp.uint8),
            flags=jnp.zeros((p,), jnp.uint8),
        )


PROP_FLAG_SOLID = 1
PROP_FLAG_VISIBLE = 2
PROP_FLAG_MOVABLE = 4


class AgentState(struct.PyTreeNode):
    """Batched (over agents) kinematic agent state.

    Mirrors DefaultKinematicAgent + KinematicCharacterController mutable state
    (agent.hpp:105-121, kinematic_character_controller.hpp:149-206). `pos` is the
    ghost-object origin == capsule center.
    """

    pos: jax.Array      # f32 [A,3]
    yaw: jax.Array      # f32 [A] rotation about +Y; forward = (-sin, 0, -cos)
    pitch: jax.Array    # f32 [A] camera pitch (currXRotation, agent.cpp:112-126)
    vvel: jax.Array     # f32 [A] vertical velocity (m_verticalVelocity)
    hvel: jax.Array     # f32 [A,3] horizontal velocity, y component always 0
    jumping: jax.Array  # bool [A] (m_wasJumping)
    on_ground: jax.Array  # bool [A]
    carried: jax.Array  # int16 [A] prop index being carried, -1 if none
    spawn_pos: jax.Array  # f32 [A,3] initial position (for fall-detection teleport)

    @staticmethod
    def create(num_agents: int) -> "AgentState":
        a = num_agents
        return AgentState(
            pos=jnp.zeros((a, 3), jnp.float32),
            yaw=jnp.zeros((a,), jnp.float32),
            pitch=jnp.zeros((a,), jnp.float32),
            vvel=jnp.zeros((a,), jnp.float32),
            hvel=jnp.zeros((a, 3), jnp.float32),
            jumping=jnp.zeros((a,), bool),
            # Reference parity: onGround() is |vvel|<eps && |voffset|<eps
            # (kcc.cpp:679-682) — TRUE for a freshly spawned controller even
            # mid-air, so the first tick accelerates with the GROUND budget
            # (50 m/s^2), not the 3 m/s^2 air budget (kcc_golden trace).
            on_ground=jnp.ones((a,), bool),
            carried=jnp.full((a,), -1, jnp.int16),
            spawn_pos=jnp.zeros((a, 3), jnp.float32),
        )


class SceneData(struct.PyTreeNode):
    """Everything produced by procedural episode generation (one episode layout).

    This is the payload stored in the device-side layout buffer used for
    auto-reset; consuming it replaces the reference's scene+physics rebuild at
    reset (env.cpp:57-76). The merged-box list mirrors the reference's greedy
    box merge (component_voxel_grid.hpp:108-187) and is what the renderer
    consumes; the voxel fields drive physics and game logic.
    """

    # Voxel color and the raw vtype grid live host-side only (they drive the
    # greedy render-box merge); device logic only ever reads the SOLID bit,
    # which ships bit-PACKED as u32 columns (8x smaller than the u8 grid —
    # the auto-reset select and physics scans are HBM-bound, so the packing
    # is a direct bandwidth win). vterrain/vobj collapse to shape (1,1,1) for
    # scenarios whose device logic never reads them.
    cols: jax.Array     # uint32 [X, W, Z] packed SOLID columns (bit y%32 of
                        # word y//32 = cell y; ops/grid.pack_solid_columns_np)
    vterrain: jax.Array  # uint8 [X,Y,Z] terrain bit flags (TERRAIN_*)
    vobj: jax.Array     # int16 [X,Y,Z] prop index + 1 occupying the voxel (0 = none)
    box_lo: jax.Array   # f32 [M,3] merged layout boxes (render), world coords
    box_hi: jax.Array   # f32 [M,3]
    box_color: jax.Array  # uint8 [M] palette index, 0 = unused slot
    props: PropState
    agent_spawn: jax.Array  # f32 [A,3] ghost-object spawn origins
    agent_yaw: jax.Array    # f32 [A] random initial yaw
    episode_len_sec: jax.Array  # f32 scalar
    scen: Any           # scenario-specific pytree (fixed shapes)


class EnvState(struct.PyTreeNode):
    """Full dynamic state of one environment (unbatched).

    Mirrors Env::EnvState (env.hpp:124-170) plus the per-episode scene content.
    """

    # Scene / layout
    cols: jax.Array
    vterrain: jax.Array
    vobj: jax.Array
    box_lo: jax.Array
    box_hi: jax.Array
    box_color: jax.Array
    props: PropState
    agents: AgentState

    # Episode bookkeeping (ref env.hpp:155-163)
    done: jax.Array           # bool scalar
    num_frames: jax.Array     # int32 scalar
    episode_sec: jax.Array    # f32 scalar
    episode_len_sec: jax.Array  # f32 scalar (can vary per episode)
    last_reward: jax.Array    # f32 [A]
    total_reward: jax.Array   # f32 [A]
    true_objective: jax.Array  # f32 [A]

    # RNG chain: equivalent of per-env std::mt19937 (env.hpp:169)
    rng: jax.Array            # jax PRNG key

    # Scenario-specific pytree
    scen: Any


def state_from_scene(scene: SceneData, num_agents: int, rng: jax.Array) -> EnvState:
    """Build a fresh EnvState from a generated episode layout.

    The equivalent of Env::reset consuming the scenario's generation output
    (env.cpp:57-76 + DefaultScenario::spawnAgents, scenario_default.hpp:80-97).
    """
    agents = AgentState.create(num_agents)
    agents = agents.replace(
        pos=scene.agent_spawn,
        yaw=scene.agent_yaw,
        spawn_pos=scene.agent_spawn,
    )
    a = num_agents
    return EnvState(
        cols=scene.cols,
        vterrain=scene.vterrain,
        vobj=scene.vobj,
        box_lo=scene.box_lo,
        box_hi=scene.box_hi,
        box_color=scene.box_color,
        props=scene.props,
        agents=agents,
        done=jnp.asarray(False),
        num_frames=jnp.asarray(0, jnp.int32),
        episode_sec=jnp.asarray(0.0, jnp.float32),
        episode_len_sec=scene.episode_len_sec,
        last_reward=jnp.zeros((a,), jnp.float32),
        total_reward=jnp.zeros((a,), jnp.float32),
        true_objective=jnp.zeros((a,), jnp.float32),
        rng=rng,
        scen=scene.scen,
    )


def tree_select(pred: jax.Array, on_true, on_false):
    """Elementwise pytree select with a scalar predicate (vmap-friendly)."""
    def sel(a, b):
        p = jnp.reshape(pred, (1,) * a.ndim) if a.ndim else pred
        return jnp.where(p, a, b)

    return jax.tree.map(sel, on_true, on_false)


def multidiscrete_to_bitmask(actions: jax.Array) -> jax.Array:
    """Convert factorized actions [..., 6] to the reference bitmask encoding.

    Mirrors bindings/megaverse.cpp:100-117.
    """
    actions = actions.astype(jnp.int32)
    tables = [jnp.asarray(bits, jnp.int32) for bits in C.ACTION_HEAD_BITS]
    mask = jnp.zeros(actions.shape[:-1], jnp.int32)
    for h, table in enumerate(tables):
        mask = mask | table[actions[..., h]]
    return mask
