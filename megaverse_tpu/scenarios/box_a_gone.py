"""BoxAGone scenario: disappearing-platform last-man-standing.

ref: scenarios/src/scenario_box_a_gone.cpp + scenario_box_a_gone.hpp.
A 24x24 walled arena (voxel size 2) with 2-3 levels of thin tiles; stepping
onto a new tile arms it: it swaps to a green "temporary" platform that
inflates and vanishes after 15 ticks (step, cpp:97-177); leaving a tile
accelerates its timer to 3 ticks. Per-step reward while off the floor;
touching the floor penalizes. Each agent is its own team (hpp:92).
Episode 300 s, vertical look limit 0.75 (hpp:74-79).

Deviation: tiles sit flush with their voxel TOP here (collision is the full
voxel), where the reference floats them mid-voxel on thin Bullet boxes — same
mechanics, tiles drawn ~1 m higher.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from megaverse_tpu import constants as C
from megaverse_tpu.ops import grid as G
from megaverse_tpu.scenarios import register_scenario
from megaverse_tpu.scenarios.base import HostScene, Scenario
from megaverse_tpu.types import EnvState, GridConfig, SceneData, PROP_FLAG_VISIBLE

K_FLOOR = "boxagoneTouchedFloor"
K_STEP = "boxagonePerStepReward"

VOXEL = 2.0
SIZE = 24
T_MAX = 3 * 18 * 18  # 3 levels x up to 18x18 tiles
_TILE_COLORS = ("ORANGE", "BLUE", "VIOLET")


class BoxAGoneState(struct.PyTreeNode):
    tile_voxel: jax.Array      # i32 [T, 3]
    tile_prop: jax.Array       # i32 [T]
    tile_active: jax.Array     # bool [T] (still standing)
    tile_ticks: jax.Array      # i32 [T] remaining ticks; -1 = not armed
    last_tile: jax.Array       # i32 [A] tile index agent stands on (-1 none)
    seconds_off_floor: jax.Array  # f32 [A] secondsBeforeTouchedFloor
    finished: jax.Array        # bool


class BoxAGoneScenario(Scenario):
    name = "BoxAGone"
    max_boxes = 16
    prop_segments = ((C.PROP_BOX, T_MAX),)
    shaping_keys = (K_FLOOR, K_STEP)

    def default_params(self) -> Dict[str, float]:
        p = super().default_params()
        p[C.P_EPISODE_LENGTH_SEC] = 300.0
        p[C.P_VERTICAL_LOOK_LIMIT] = 0.75
        return p

    def _reward_shaping(self) -> Dict[str, float]:
        return {K_FLOOR: -0.1, K_STEP: 0.01}

    def team_affinity(self) -> np.ndarray:
        return np.arange(self.num_agents, dtype=np.int32)

    def grid_config(self) -> GridConfig:
        return GridConfig(dims=(SIZE, 14, SIZE), voxel_size=VOXEL, origin=(0.0, 0.0, 0.0))

    # ------------------------------------------------------------- generate
    def generate(self, rng: np.random.Generator) -> SceneData:
        rr = lambda lo, hi: int(rng.integers(lo, hi))
        num_levels = rr(2, 4)
        levels = []
        spawn_cells = []
        level_h = 1
        for level in range(num_levels):
            level_h += rr(2, 4)
            ll, lw = rr(10, 19), rr(10, 19)
            sx, sz = SIZE // 2 - ll // 2, SIZE // 2 - lw // 2
            skip_p = rng.random() * 0.2
            tiles = []
            for x in range(sx, sx + ll):
                for z in range(sz, sz + lw):
                    if rng.random() < skip_p:
                        continue
                    tiles.append((x, z))
                    if level == num_levels - 1:
                        spawn_cells.append((x, level_h, z))
            levels.append((level_h, tiles))
        if not spawn_cells:
            spawn_cells = [(SIZE // 2, 1, SIZE // 2)]
        while len(spawn_cells) < self.num_agents:
            spawn_cells.append(spawn_cells[0])
        order = rng.permutation(len(spawn_cells))
        spawns = [spawn_cells[order[i]] for i in range(self.num_agents)]
        yaws = [rng.random() * 2 * np.pi for _ in range(self.num_agents)]
        return self._build(levels, spawns, yaws)

    supports_ref_stream = True

    def generate_ref(self, rng) -> SceneData:
        """Reference draw order (BoxAGoneScenario::reset, cpp:41-96: numLevels
        -> per level height/length/width/skipProb f32 + per-cell skip frand
        (x-major) -> spawn pad + std::shuffle; then spawnAgents yaws)."""
        from megaverse_tpu.utils.refrng import ref_spawn_yaw

        num_levels = rng.rand_range(2, 4)
        levels = []
        spawn_cells = []
        level_h = 1
        for level in range(num_levels):
            level_h += rng.rand_range(2, 4)
            ll = rng.rand_range(10, 19)
            lw = rng.rand_range(10, 19)
            sx, sz = SIZE // 2 - ll // 2, SIZE // 2 - lw // 2
            skip_p = np.float32(np.float32(rng.frand()) * np.float32(0.2))
            tiles = []
            for x in range(sx, sx + ll):
                for z in range(sz, sz + lw):
                    if np.float32(rng.frand()) < skip_p:
                        continue
                    tiles.append((x, z))
                    if level == num_levels - 1:
                        spawn_cells.append((x, level_h, z))
            levels.append((level_h, tiles))
        if not spawn_cells:  # cannot occur for skipProb <= 0.2; safety only
            spawn_cells = [(SIZE // 2, 1, SIZE // 2)]
        while len(spawn_cells) < self.num_agents:
            spawn_cells.append(spawn_cells[0])
        rng.shuffle(spawn_cells)
        spawns = spawn_cells[:self.num_agents]
        yaws = [ref_spawn_yaw(rng) for _ in range(self.num_agents)]
        return self._build(levels, spawns, yaws)

    def _build(self, levels, spawns, yaws) -> SceneData:
        scene = HostScene(self.cfg)
        white = C.COLOR_IDX["WHITE"]

        # floor + walls (height 8 voxels)
        scene.vtype[0:SIZE, 0, 0:SIZE] |= C.VOXEL_SOLID | C.VOXEL_OPAQUE
        scene.vcolor[0:SIZE, 0, 0:SIZE] = white
        for (xs, zs) in ((np.s_[0:1], np.s_[0:SIZE]), (np.s_[SIZE - 1:SIZE], np.s_[0:SIZE]),
                         (np.s_[0:SIZE], np.s_[0:1]), (np.s_[0:SIZE], np.s_[SIZE - 1:SIZE])):
            scene.vtype[xs, 0:8, zs] |= C.VOXEL_SOLID | C.VOXEL_OPAQUE
            scene.vcolor[xs, 0:8, zs] = white

        tile_voxel = np.zeros((T_MAX, 3), np.int32)
        tile_prop = np.zeros((T_MAX,), np.int32)
        tile_active = np.zeros((T_MAX,), bool)
        ti = 0
        obj_size = 0.42 * VOXEL
        thickness = obj_size * 0.045

        for level, (level_h, tiles) in enumerate(levels):
            color = C.COLOR_IDX[_TILE_COLORS[level % 3]]
            for (x, z) in tiles:
                if ti >= T_MAX:
                    continue
                # tile drawn flush with the voxel top (see deviation note)
                center = np.array([
                    (x + 0.5) * VOXEL, (level_h + 1) * VOXEL - thickness, (z + 0.5) * VOXEL])
                idx = scene.add_prop(C.PROP_BOX, center,
                                     (obj_size, thickness, obj_size), color)
                scene.vtype[x, level_h, z] |= C.VOXEL_SOLID
                tile_voxel[ti] = [x, level_h, z]
                tile_prop[ti] = idx
                tile_active[ti] = True
                ti += 1

        a = self.num_agents
        # ref spawn: ((v + .5) * voxelSize); agents stand on top of the tile
        for i, sp in enumerate(spawns):
            scene.agent_spawn[i] = [
                (sp[0] + 0.5) * VOXEL,
                (sp[1] + 1) * VOXEL + C.AGENT_HALF_HEIGHT + 0.05,
                (sp[2] + 0.5) * VOXEL]
            scene.agent_yaw[i] = yaws[i]

        scen = BoxAGoneState(
            tile_voxel=tile_voxel,
            tile_prop=tile_prop,
            tile_active=tile_active,
            tile_ticks=np.full((T_MAX,), -1, np.int32),
            last_tile=np.full((a,), -1, np.int32),
            seconds_off_floor=np.zeros((a,), np.float32),
            finished=np.asarray(False),
        )
        return scene.finish(self.max_boxes, scen=scen)

    # ------------------------------------------------------------- step
    def scen_step(self, state: EnvState, action: jax.Array, shaping: jax.Array):
        num_agents = self.num_agents
        cfg = self.cfg.grid
        rewards = jnp.zeros((num_agents,), jnp.float32)
        sc: BoxAGoneState = state.scen

        t = state.agents.pos + jnp.asarray([0.0, C.AGENT_BODY_OFFSET_Y, 0.0])
        coords = G.world_to_voxel(cfg, t)
        touches_floor = coords[:, 1] < 3

        rewards = self.reward_team(rewards, shaping, K_FLOOR,
                                   touches_floor.astype(jnp.float32), 1.0)
        rewards = self.reward_team(rewards, shaping, K_STEP,
                                   (~touches_floor).astype(jnp.float32), 1.0)
        seconds = jnp.where(~touches_floor, state.episode_sec, sc.seconds_off_floor)

        # which tile is each agent standing on? Agents stand ON the voxel top,
        # so the tile voxel is one below the agent's voxel.
        below = coords - jnp.asarray([0, 1, 0])
        on_tile = jnp.all(sc.tile_voxel[:, None, :] == below[None, :, :], axis=-1)  # [T, A]
        on_tile = on_tile & sc.tile_active[:, None] & state.agents.on_ground[None, :]
        agent_tile = jnp.where(jnp.any(on_tile, axis=0),
                               jnp.argmax(on_tile.astype(jnp.int32), axis=0), -1)  # [A]

        # Per-agent arming runs SEQUENTIALLY in agent order, matching the
        # reference's agent loop (scenario_box_a_gone.cpp:100-148): agent i's
        # arming / previous-tile acceleration is visible to agent i+1 within
        # the same tick (e.g. i arms a tile, i+1 leaving that tile clips its
        # fresh 15-tick timer to 3). Scalar work per pass; A is tiny.
        ticks = sc.tile_ticks
        last_tile = sc.last_tile
        props = state.props
        colors, scales = props.color, props.scale
        for a in range(num_agents):
            tile_a = agent_tile[a]
            changed = (tile_a >= 0) & (tile_a != last_tile[a])
            # previous tile's timer -> min(current, 3) (cpp:120-125)
            prev = last_tile[a]
            prev_valid = changed & (prev >= 0)
            prev_idx = jnp.maximum(prev, 0)
            armed_prev = ticks[prev_idx] >= 0
            ticks = ticks.at[prev_idx].set(jnp.where(
                prev_valid & armed_prev, jnp.minimum(ticks[prev_idx], 3),
                ticks[prev_idx]))
            # arm the new tile with 15 ticks if not armed (cpp:127-141)
            cur_idx = jnp.maximum(tile_a, 0)
            arm = changed & (ticks[cur_idx] < 0)
            ticks = ticks.at[cur_idx].set(jnp.where(arm, 15, ticks[cur_idx]))
            # visual: armed tile turns green and inflates 1.05x
            pidx = sc.tile_prop[cur_idx]
            colors = colors.at[pidx].set(
                jnp.where(arm, jnp.uint8(C.COLOR_IDX["GREEN"]), colors[pidx]))
            scales = scales.at[pidx].set(
                jnp.where(arm, scales[pidx] * 1.05, scales[pidx]))
            last_tile = last_tile.at[a].set(
                jnp.where(changed, tile_a, last_tile[a]))
        props = props.replace(color=colors, scale=scales)

        # tick down armed tiles (cpp:152-173)
        armed = ticks > 0
        ticks = jnp.where(armed, ticks - 1, ticks)
        expiring = armed & (ticks == 0)
        inflating = armed & (ticks > 0) & (ticks <= 5)
        scales2 = jnp.where(inflating[:, None], props.scale[sc.tile_prop] * 1.03,
                            props.scale[sc.tile_prop])
        props = props.replace(scale=props.scale.at[sc.tile_prop].set(scales2))

        # expiry: hide prop, clear voxel solidity
        vis_mask = ~jnp.uint8(PROP_FLAG_VISIBLE)
        flags = props.flags.at[sc.tile_prop].set(
            jnp.where(expiring, props.flags[sc.tile_prop] & vis_mask,
                      props.flags[sc.tile_prop]))
        props = props.replace(flags=flags)
        cols = G.update_cols(
            cfg, state.cols,
            jnp.where(expiring[:, None], sc.tile_voxel, -1), False)
        tile_active = sc.tile_active & ~expiring

        all_on_floor = jnp.all(touches_floor)
        finish_now = all_on_floor & ~sc.finished
        episode_sec = jnp.where(
            finish_now,
            jnp.maximum(state.episode_sec, state.episode_len_sec - 0.3),
            state.episode_sec)

        sc = sc.replace(
            tile_ticks=ticks, tile_active=tile_active, last_tile=last_tile,
            seconds_off_floor=seconds, finished=sc.finished | finish_now)

        # trueObjective (hpp:56-71): winner-take-all if multi-agent
        if num_agents > 1:
            best = jnp.argmax(sc.seconds_off_floor)
            tobj = (jnp.arange(num_agents) == best).astype(jnp.float32)
        else:
            tobj = sc.seconds_off_floor / state.episode_len_sec

        state = state.replace(
            cols=cols, props=props, scen=sc, episode_sec=episode_sec,
            true_objective=tobj)
        return state, rewards


register_scenario("BoxAGone", BoxAGoneScenario)
