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


L_MAX = 3  # max levels (rand_range(2, 4))


class BoxAGoneState(struct.PyTreeNode):
    """Tile state lives on DENSE per-level grids [L_MAX, SIZE, SIZE]: the
    round-4 per-tile layout ([T_MAX] arrays + a 972-row coordinate scatter
    into the packed column grid every step) made BoxAGone's sim 145 ms at
    1024 envs — 14x Collect — because TPU scatters serialize per row. On
    grids, arming/expiry are elementwise, the props-table updates become
    gathers through the static cell<->prop-row maps, and the column-grid
    solidity is recomputed each step as base_cols | (active << level_h) —
    no scatter anywhere in the hot path."""
    tile_voxel: jax.Array      # i32 [T, 3] voxel per tile, generation order
    #                            (static; parity introspection + tests)
    tile_prop: jax.Array       # i32 [L_MAX, SIZE, SIZE] prop row per cell,
    #                            -1 = no tile (static)
    prop_cell: jax.Array       # i32 [T_MAX] flat cell (l*S*S + x*S + z) per
    #                            tile prop row, -1 dead (static inverse map)
    level_h: jax.Array         # i32 [L_MAX] level voxel heights, -1 absent
    base_cols: jax.Array       # u32 [SIZE, 1, SIZE] packed solid columns
    #                            WITHOUT tile bits (static)
    tile_active: jax.Array     # bool [L_MAX, SIZE, SIZE] (still standing)
    tile_ticks: jax.Array      # i32 [L_MAX, SIZE, SIZE]; -1 = not armed
    last_tile: jax.Array       # i32 [A] flat cell agent stands on (-1 none)
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
        tile_prop = np.full((L_MAX, SIZE, SIZE), -1, np.int32)
        prop_cell = np.full((T_MAX,), -1, np.int32)
        level_hs = np.full((L_MAX,), -1, np.int32)
        tile_active = np.zeros((L_MAX, SIZE, SIZE), bool)
        ti = 0
        obj_size = 0.42 * VOXEL
        thickness = obj_size * 0.045

        for level, (level_h, tiles) in enumerate(levels):
            color = C.COLOR_IDX[_TILE_COLORS[level % 3]]
            level_hs[level] = level_h
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
                tile_prop[level, x, z] = idx
                prop_cell[idx] = level * SIZE * SIZE + x * SIZE + z
                tile_active[level, x, z] = True
                ti += 1

        a = self.num_agents
        # ref spawn: ((v + .5) * voxelSize); agents stand on top of the tile
        for i, sp in enumerate(spawns):
            scene.agent_spawn[i] = [
                (sp[0] + 0.5) * VOXEL,
                (sp[1] + 1) * VOXEL + C.AGENT_HALF_HEIGHT + 0.05,
                (sp[2] + 0.5) * VOXEL]
            scene.agent_yaw[i] = yaws[i]

        # packed columns WITHOUT the tile bits: the step recomputes
        # state.cols = base | (active << level_h) instead of scattering
        # per-tile deltas
        base_cols = G.pack_solid_columns_np(scene.vtype).copy()
        for level in range(L_MAX):
            h = int(level_hs[level])
            if h < 0:
                continue
            base_cols[:, 0, :] &= ~np.where(
                tile_active[level], np.uint32(1) << np.uint32(h),
                np.uint32(0))

        scen = BoxAGoneState(
            tile_voxel=tile_voxel,
            tile_prop=tile_prop,
            prop_cell=prop_cell,
            level_h=level_hs,
            base_cols=base_cols,
            tile_active=tile_active,
            tile_ticks=np.full((L_MAX, SIZE, SIZE), -1, np.int32),
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
        # so the tile voxel is one below the agent's voxel. The cell resolves
        # through the dense per-level grids: level by height match, then a
        # single [A]-gather.
        below = coords - jnp.asarray([0, 1, 0])
        # level_h >= 0 guard: an agent's below.y of -1 (standing in the
        # bottom voxel row) must not match an absent level's -1 sentinel
        lvl_match = ((sc.level_h[None, :] == below[:, 1:2])
                     & (sc.level_h[None, :] >= 0))                  # [A, L]
        has_lvl = jnp.any(lvl_match, axis=1)
        lvl = jnp.argmax(lvl_match, axis=1)                         # [A]
        in_b = ((below[:, 0] >= 0) & (below[:, 0] < SIZE)
                & (below[:, 2] >= 0) & (below[:, 2] < SIZE))
        gx = jnp.clip(below[:, 0], 0, SIZE - 1)
        gz = jnp.clip(below[:, 2], 0, SIZE - 1)
        on = (has_lvl & in_b & sc.tile_active[lvl, gx, gz]
              & state.agents.on_ground)
        agent_tile = jnp.where(on, lvl * SIZE * SIZE + gx * SIZE + gz, -1)

        # Per-agent arming runs SEQUENTIALLY in agent order, matching the
        # reference's agent loop (scenario_box_a_gone.cpp:100-148): agent i's
        # arming / previous-tile acceleration is visible to agent i+1 within
        # the same tick (e.g. i arms a tile, i+1 leaving that tile clips its
        # fresh 15-tick timer to 3). Scalar work per pass; A is tiny.
        ticks = sc.tile_ticks.reshape(-1)           # flat cell view
        prop_of = sc.tile_prop.reshape(-1)
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
            pidx = jnp.maximum(prop_of[cur_idx], 0)  # valid whenever arm
            colors = colors.at[pidx].set(
                jnp.where(arm, jnp.uint8(C.COLOR_IDX["GREEN"]), colors[pidx]))
            scales = scales.at[pidx].set(
                jnp.where(arm, scales[pidx] * 1.05, scales[pidx]))
            last_tile = last_tile.at[a].set(
                jnp.where(changed, tile_a, last_tile[a]))
        props = props.replace(color=colors, scale=scales)

        # tick down armed tiles (cpp:152-173) — dense elementwise on the
        # grids; the props-table updates GATHER through the static inverse
        # map prop_cell (no scatters)
        armed = ticks > 0
        ticks = jnp.where(armed, ticks - 1, ticks)
        expiring = armed & (ticks == 0)
        inflating = armed & (ticks > 0) & (ticks <= 5)
        cell = jnp.maximum(sc.prop_cell, 0)                  # [T_MAX]
        has_tile = sc.prop_cell >= 0
        infl_row = inflating[cell] & has_tile
        exp_row = expiring[cell] & has_tile
        props = props.replace(
            scale=jnp.where(infl_row[:, None], props.scale * 1.03,
                            props.scale))

        # expiry: hide prop, clear voxel solidity
        vis_mask = ~jnp.uint8(PROP_FLAG_VISIBLE)
        props = props.replace(flags=jnp.where(
            exp_row, props.flags & vis_mask, props.flags))
        tile_active = sc.tile_active & ~expiring.reshape(sc.tile_active.shape)
        # packed solid columns = static base | active tiles at their level
        # heights (one elementwise pass over [L, S, S] — replaces the
        # 972-row per-step scatter)
        ov = jnp.zeros((SIZE, SIZE), jnp.uint32)
        for level in range(L_MAX):
            h = sc.level_h[level]
            bit = jnp.where(h >= 0,
                            jnp.left_shift(jnp.uint32(1),
                                           jnp.maximum(h, 0).astype(jnp.uint32)),
                            jnp.uint32(0))
            ov = ov | jnp.where(tile_active[level], bit, jnp.uint32(0))
        cols = sc.base_cols | ov[:, None, :]

        all_on_floor = jnp.all(touches_floor)
        finish_now = all_on_floor & ~sc.finished
        episode_sec = jnp.where(
            finish_now,
            jnp.maximum(state.episode_sec, state.episode_len_sec - 0.3),
            state.episode_sec)

        sc = sc.replace(
            tile_ticks=ticks.reshape(sc.tile_ticks.shape),
            tile_active=tile_active, last_tile=last_tile,
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


def num_tiles(scen: BoxAGoneState) -> int:
    """Live tile count (host-side helper; tile t <-> prop row t)."""
    return int((np.asarray(scen.prop_cell) >= 0).sum())


def tile_cell(scen: BoxAGoneState, t: int) -> int:
    """Flat dense-grid cell index (l*S*S + x*S + z) of tile `t`
    (host-side helper for tests/introspection)."""
    v = np.asarray(scen.tile_voxel)[t]
    lvl = int(np.nonzero(np.asarray(scen.level_h) == v[1])[0][0])
    return int(lvl * SIZE * SIZE + v[0] * SIZE + v[2])


register_scenario("BoxAGone", BoxAGoneScenario)
