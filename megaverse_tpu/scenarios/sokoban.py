"""Sokoban scenario (Boxoban levels at voxel size 2).

ref: scenarios/src/scenario_sokoban.cpp + scenario_sokoban.hpp.
Parses '# $ . @ *' char maps (createLayout, cpp:120-166): floor at y=0,
invisible solid walls (y=1..2) capped with orange blocks, light-green goal
pads, dark-blue pushable boxes. Discrete box pushing on Interact with
manhattan-adjacency + occupancy checks and goal-count rewards (step,
cpp:168-233). Episode length 80 s (hpp:50-54).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from megaverse_tpu import constants as C
from megaverse_tpu.ops import grid as G
from megaverse_tpu.scenarios import register_scenario
from megaverse_tpu.scenarios.base import HostScene, Scenario
from megaverse_tpu.scenarios.components import pickup_spot
from megaverse_tpu.types import EnvState, GridConfig, SceneData

K_ON = "sokobanBoxOnTarget"
K_OFF = "sokobanBoxLeavesTarget"
K_ALL = "sokobanAllBoxesOnTarget"

SIZE = 10       # boxoban levels are 10x10
VOXEL = 2.0     # ref voxelSize = 2 (hpp:67)
MAX_SOKO_BOXES = 8

_FLOOR_COLORS = [C.COLOR_IDX[n] for n in (
    "WHITE", "VERY_LIGHT_YELLOW", "VERY_LIGHT_BLUE", "VERY_LIGHT_ORANGE", "DARK_GREY")]


class SokobanState(struct.PyTreeNode):
    goal: jax.Array            # bool [X, Z] goal pads
    wall: jax.Array            # bool [X, Z] wall cells
    num_boxes: jax.Array       # i32
    boxes_on_goal: jax.Array   # i32
    solved: jax.Array          # bool


class SokobanScenario(Scenario):
    name = "Sokoban"
    max_boxes = 64
    prop_segments = ((C.PROP_BOX, MAX_SOKO_BOXES),)
    needs_object_grid = True  # discrete box pushing
    shaping_keys = (K_ON, K_OFF, K_ALL)

    def __init__(self, *args, **kwargs):
        from megaverse_tpu.utils.boxoban import LevelSource

        super().__init__(*args, **kwargs)
        self._levels = LevelSource()

    def default_params(self) -> Dict[str, float]:
        p = super().default_params()
        p[C.P_EPISODE_LENGTH_SEC] = 80.0
        return p

    def _reward_shaping(self) -> Dict[str, float]:
        return {K_ON: 1.0, K_OFF: -1.0, K_ALL: 10.0}

    def grid_config(self) -> GridConfig:
        return GridConfig(dims=(SIZE, 4, SIZE), voxel_size=VOXEL, origin=(0.0, 0.0, 0.0))

    # ------------------------------------------------------------- generate
    def generate(self, rng: np.random.Generator) -> SceneData:
        rows = self._levels.sample(rng)
        floor_color = int(_FLOOR_COLORS[int(rng.integers(0, len(_FLOOR_COLORS)))])
        yaws = (rng.random(self.num_agents) * 2 * np.pi).astype(np.float32)
        return self._build(rows, floor_color, yaws)

    supports_ref_stream = True

    def generate_ref(self, rng) -> SceneData:
        # Reference draw order per reset (env.cpp:57-76 + scenario_sokoban.cpp):
        # [cache empty only] randomSample(levelFiles) + std::shuffle(levels)
        # (reloadLevels, cpp:81-102) -> pop back (no draw, cpp:104-118) ->
        # floorColor randomSample of 5 (createLayout, cpp:120-126) ->
        # per-agent spawn yaw (scenario_default.hpp:86). Golden trace:
        # tests/golden/sokoban_golden.cpp.
        from megaverse_tpu.utils.refrng import ref_spawn_yaw

        rows = self._levels.sample_ref(rng)
        floor_color = int(_FLOOR_COLORS[rng.rand_range(0, len(_FLOOR_COLORS))])
        yaws = np.asarray([ref_spawn_yaw(rng) for _ in range(self.num_agents)],
                          np.float32)
        return self._build(rows, floor_color, yaws)

    def _build(self, rows, floor_color: int, yaws: np.ndarray) -> SceneData:
        scene = HostScene(self.cfg)

        goal = np.zeros((SIZE, SIZE), bool)
        wall = np.zeros((SIZE, SIZE), bool)
        boxes: List[np.ndarray] = []
        player = None

        length = len(rows)
        for x in range(min(length, SIZE)):
            row = rows[x]
            for z in range(min(len(row), SIZE)):
                ch = row[z]
                scene.vtype[x, 0, z] |= C.VOXEL_SOLID | C.VOXEL_OPAQUE
                scene.vcolor[x, 0, z] = floor_color
                if ch == "#":
                    scene.vtype[x, 1:3, z] |= C.VOXEL_SOLID  # invisible solid
                    wall[x, z] = True
                if ch in ".+*":
                    goal[x, z] = True
                if ch in "@+":
                    player = (x, z)
                if ch in "$*":
                    boxes.append(np.array([x, 1, z]))

        # wall caps (orange, h=0.35) and goal pads (light green, h=0.025),
        # addEpisodeDrawables cpp:237-255 — merged along z runs per row.
        def emit_runs(mask, height, color):
            for x in range(SIZE):
                z = 0
                while z < SIZE:
                    if mask[x, z]:
                        z0 = z
                        while z < SIZE and mask[x, z]:
                            z += 1
                        scene.extra_boxes.append((
                            np.array([x * VOXEL, VOXEL, z0 * VOXEL], np.float32),
                            np.array([(x + 1) * VOXEL, VOXEL + height, z * VOXEL], np.float32),
                            color))
                    else:
                        z += 1

        emit_runs(wall, 0.7, C.COLOR_IDX["LIGHT_ORANGE"])
        emit_runs(goal, 0.05, C.COLOR_IDX["LIGHT_GREEN"])

        # agents spawn around the player cell (createLayout, cpp:150-157)
        a = self.num_agents
        px, pz = player if player else (1, 1)
        spawns = np.zeros((a, 3), np.float32)
        for i in range(a):
            ax = px + (i % 2) * 0.5
            az = pz + (1 if (i % 4) > 1 else 0) * 0.5
            spawns[i] = [ax * VOXEL + 0.5, VOXEL + 0.3 * i * VOXEL + C.AGENT_HEIGHT,
                         az * VOXEL + 0.5]
        scene.agent_spawn = spawns
        scene.agent_yaw = np.asarray(yaws, np.float32)

        # pushable boxes: dark blue, drawn (1, 0.45, 1)*0.8 half extents at
        # y offset +0.2*vs (cpp:257-275); voxel-solid for physics.
        for cell in boxes:
            x, y, z = cell
            center = np.array([(x + 0.5) * VOXEL, (y + 0.2) * VOXEL + 0.36, (z + 0.5) * VOXEL])
            # draw translation: (x+.5, y+.2, z+.5)*vs with half-height .36:
            center[1] = (y + 0.2) * VOXEL
            idx = scene.add_prop(C.PROP_BOX, center, (0.8, 0.36, 0.8),
                                 C.COLOR_IDX["DARK_BLUE"], solid=True, movable=True)
            scene.vobj[x, y, z] = idx + 1
            scene.vtype[x, y, z] |= C.VOXEL_SOLID

        scen = SokobanState(
            goal=goal, wall=wall,
            num_boxes=np.int32(len(boxes)),
            boxes_on_goal=np.int32(sum(1 for b in boxes if goal[b[0], b[2]])),
            solved=np.asarray(False),
        )
        return scene.finish(self.max_boxes, scen=scen)

    # ------------------------------------------------------------- step
    def scen_step(self, state: EnvState, action: jax.Array, shaping: jax.Array):
        """Multi-agent ticks run as SEQUENTIAL per-agent passes, matching the
        reference's per-agent push loop (scenario_sokoban.cpp:168-233): agent
        i's push mutates the object grid agent i+1 then queries in the same
        tick (a push can clear — or newly block — a later agent's target
        cell). Each pass is [A]-sized scalar work, so the cost is A x tiny;
        single-agent envs take the one-pass path directly."""
        if self.num_agents == 1:
            return self._soko_pass(state, action, shaping)
        rewards = jnp.zeros((self.num_agents,), jnp.float32)
        idx = jnp.arange(self.num_agents)
        for a in range(self.num_agents):
            act_a = jnp.where(idx == a, action,
                              action & ~jnp.int32(C.ACTION_INTERACT))
            state, r = self._soko_pass(state, act_a, shaping)
            rewards = rewards + r
        return state, rewards

    def _soko_pass(self, state: EnvState, action: jax.Array, shaping: jax.Array):
        cfg = self.cfg.grid
        num_agents = self.num_agents
        rewards = jnp.zeros((num_agents,), jnp.float32)
        sc: SokobanState = state.scen

        interact = (action & C.ACTION_INTERACT) != 0
        spot = pickup_spot(state.agents)           # [A,3] world
        box_voxel = G.world_to_voxel(cfg, spot)    # [A,3]
        agent_voxel = G.world_to_voxel(
            cfg, state.agents.pos + jnp.asarray([0.0, C.AGENT_BODY_OFFSET_Y, 0.0]))

        vobj = G.gather_voxel(cfg, state.vobj, box_voxel)
        has_box = vobj != 0
        man = jnp.sum(jnp.abs(box_voxel - agent_voxel), axis=-1)
        delta = box_voxel - agent_voxel
        desired = box_voxel + delta

        # target occupancy checks (cpp:190-203)
        occupied_by_agent = jnp.any(
            jnp.all(desired[:, None, :] == agent_voxel[None, :, :], axis=-1), axis=1)
        des_in = jnp.all((desired >= 0) & (desired < jnp.asarray(cfg.dims)), axis=-1)
        des_x = jnp.clip(desired[:, 0], 0, SIZE - 1)
        des_z = jnp.clip(desired[:, 2], 0, SIZE - 1)
        des_wall = sc.wall[des_x, des_z]
        des_obj = G.gather_voxel(cfg, state.vobj, desired) != 0

        push = (interact & has_box & (man == 1) & ~occupied_by_agent
                & des_in & ~des_wall & ~des_obj)
        # conflicts: same box pushed by two agents, or same destination
        same_box = jnp.all(box_voxel[:, None, :] == box_voxel[None, :, :], axis=-1)
        same_dst = jnp.all(desired[:, None, :] == desired[None, :, :], axis=-1)
        earlier = jnp.tril(jnp.ones((num_agents, num_agents), bool), k=-1)
        lost = jnp.any((same_box | same_dst) & earlier & push[None, :], axis=1) & push
        push = push & ~lost

        # apply pushes
        box_idx = jnp.maximum(vobj.astype(jnp.int32) - 1, 0)
        # masked coords: only pushing rows scatter (a losing row re-writing
        # its gathered old value could race the winner at a shared cell)
        vobj_f = G.set_voxel(cfg, state.vobj,
                             jnp.where(push[:, None], box_voxel, -1),
                             jnp.zeros((), state.vobj.dtype))
        vobj_f = G.set_voxel(cfg, vobj_f,
                             jnp.where(push[:, None], desired, -1), vobj)
        cols_f = G.update_cols(
            cfg, state.cols, jnp.where(push[:, None], box_voxel, -1), False)
        cols_f = G.update_cols(
            cfg, cols_f, jnp.where(push[:, None], desired, -1), True)

        props = state.props
        dpos = (delta.astype(jnp.float32)) * VOXEL
        new_pos = props.pos.at[box_idx].add(jnp.where(push[:, None], dpos, 0.0))
        state = state.replace(cols=cols_f, vobj=vobj_f,
                              props=props.replace(pos=new_pos))

        # goal bookkeeping (cpp:209-226)
        src_goal = sc.goal[jnp.clip(box_voxel[:, 0], 0, SIZE - 1),
                           jnp.clip(box_voxel[:, 2], 0, SIZE - 1)]
        dst_goal = sc.goal[des_x, des_z]
        onto = push & ~src_goal & dst_goal
        off = push & src_goal & ~dst_goal
        rewards = self.reward_team(rewards, shaping, K_ON, onto.astype(jnp.float32), 1.0)
        rewards = self.reward_team(rewards, shaping, K_OFF, off.astype(jnp.float32), 1.0)

        on_goal = sc.boxes_on_goal + jnp.sum(onto) - jnp.sum(off)
        solve_now = (on_goal == sc.num_boxes) & jnp.any(onto) & ~sc.solved
        solver_mask = (onto & (jnp.cumsum(onto) == 1)).astype(jnp.float32) * solve_now
        rewards = self.reward_team(rewards, shaping, K_ALL, solver_mask, 1.0)
        episode_sec = jnp.where(
            solve_now,
            jnp.maximum(state.episode_sec, state.episode_len_sec - 0.3),
            state.episode_sec)

        sc = sc.replace(boxes_on_goal=on_goal.astype(jnp.int32),
                        solved=sc.solved | solve_now)
        state = state.replace(
            scen=sc, episode_sec=episode_sec,
            true_objective=jnp.full((num_agents,), sc.solved.astype(jnp.float32)))
        return state, rewards


register_scenario("Sokoban", SokobanScenario)
