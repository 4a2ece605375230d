"""Scenario generation + mechanics tests (counterpart of the reference's
env_tests.cpp + scenario behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import megaverse_tpu.constants as C
from megaverse_tpu.scenarios import make_scenario, registered_scenarios

ALL_SCENARIOS = [
    "Empty", "Test", "Football", "BoxAGone", "TowerBuilding",
    "ObstaclesEasy", "ObstaclesMedium", "ObstaclesHard",
    "Collect", "Sokoban", "HexMemory", "HexExplore", "Rearrange",
    "ObstaclesWalls", "ObstaclesSteps", "ObstaclesLava",
]


def test_registry_matches_reference():
    """All 16 names from scenariosGlobalInit (init.hpp:26-57) register."""
    names = set(registered_scenarios())
    for n in ALL_SCENARIOS:
        assert n.casefold() in names


@pytest.mark.parametrize("name", ALL_SCENARIOS)
def test_generation_deterministic(name):
    s = make_scenario(name, num_agents=2)
    a = s.generate(np.random.default_rng(99))
    s2 = make_scenario(name, num_agents=2)
    b = s2.generate(np.random.default_rng(99))
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("name", ALL_SCENARIOS)
def test_generation_within_capacity(name):
    s = make_scenario(name, num_agents=4)
    for seed in range(3):
        sc = s.generate(np.random.default_rng(seed))
        x, y, z = s.cfg.grid.dims
        assert sc.cols.shape == (x, -(-y // 32), z)
        assert np.isfinite(np.asarray(sc.agent_spawn)).all()
        # agents spawn inside the grid bounds
        lo = np.asarray(s.cfg.grid.origin)
        hi = lo + np.asarray(s.cfg.grid.dims) * s.cfg.grid.voxel_size
        sp = np.asarray(sc.agent_spawn)
        assert (sp[:, 0] >= lo[0]).all() and (sp[:, 0] <= hi[0]).all()
        assert (sp[:, 2] >= lo[2]).all() and (sp[:, 2] <= hi[2]).all()


def _single_env(name, seed=0, num_agents=1, **params):
    from megaverse_tpu.types import state_from_scene

    s = make_scenario(name, num_agents=num_agents, params=params or None)
    sc = s.generate(np.random.default_rng(seed))
    state = state_from_scene(jax.tree.map(jnp.asarray, sc), num_agents,
                             jax.random.PRNGKey(0))
    return s, state


def test_sokoban_push_box():
    """Pushing a box with Interact moves it one cell (cpp:168-233)."""
    from megaverse_tpu.ops import grid as G

    s, state = _single_env("Sokoban", seed=1)
    cfg = s.cfg.grid
    # place the agent manually next to the first box, facing it (+x)
    vobj = np.asarray(state.vobj)
    bx, by, bz = [int(v[0]) for v in np.nonzero(vobj)]
    box_idx = int(vobj[bx, by, bz])
    # stand one voxel -x of the box, face +x (yaw = -pi/2)
    apos = jnp.asarray([[(bx - 1 + 0.5) * 2.0, 2.0 + C.AGENT_HALF_HEIGHT,
                         (bz + 0.5) * 2.0]])
    agents = state.agents.replace(pos=apos, yaw=jnp.asarray([-np.pi / 2]))
    state = state.replace(agents=agents)

    shaping = jnp.asarray(s.shaping_array())
    action = jnp.asarray([C.ACTION_INTERACT], jnp.int32)
    state2, rew = s.scen_step(state, action, shaping)

    vobj2 = np.asarray(state2.vobj)
    dest_in_grid = bx + 1 < cfg.dims[0]
    wall = np.asarray(state.scen.wall)
    if dest_in_grid and not wall[bx + 1, bz] and vobj[bx + 1, by, bz] == 0:
        assert vobj2[bx, by, bz] == 0
        assert vobj2[bx + 1, by, bz] == box_idx
        # prop moved 2 m (voxel size)
        moved = np.asarray(state2.props.pos)[box_idx - 1] - np.asarray(state.props.pos)[box_idx - 1]
        np.testing.assert_allclose(moved, [2.0, 0.0, 0.0], atol=1e-5)
    else:
        # blocked: nothing moves
        np.testing.assert_array_equal(vobj2, vobj)


def test_stacking_pick_and_place():
    """Interact picks up a facing movable box; Interact again places it."""
    from megaverse_tpu.scenarios.components import object_stacking_step

    s, state = _single_env("TowerBuilding", seed=2)
    cfg = s.cfg.grid
    vobj = np.asarray(state.vobj)
    xs, ys, zs = np.nonzero(vobj)
    # choose a box with a free voxel at -x (so the agent can stand there)
    found = None
    cols = np.asarray(state.cols)
    solid = lambda x, y, z: (cols[x, y >> 5, z] >> (y & 31)) & 1
    for x, y, z in zip(xs, ys, zs):
        if x >= 2 and vobj[x - 1, y, z] == 0 and not solid(x - 1, y, z):
            found = (int(x), int(y), int(z))
            break
    assert found is not None
    bx, by, bz = found
    box_idx = int(vobj[bx, by, bz]) - 1

    # stand 1 voxel -x from the box, face +x; pickup spot lands in the box voxel
    apos = jnp.asarray([[bx - 1 + 0.5, by + C.AGENT_HALF_HEIGHT, bz + 0.5]])
    agents = state.agents.replace(pos=apos, yaw=jnp.asarray([-np.pi / 2]))
    state = state.replace(agents=agents)

    action = jnp.asarray([C.ACTION_INTERACT], jnp.int32)
    res = object_stacking_step(cfg, state, action)
    assert bool(res.picked[0])
    assert int(res.state.agents.carried[0]) == box_idx
    assert np.asarray(res.state.vobj)[bx, by, bz] == 0
    # carried object scaled by 0.78
    np.testing.assert_allclose(
        np.asarray(res.state.props.scale)[box_idx], 0.39 * 0.78, atol=1e-5)


def test_collect_reward_pickup():
    """Walking into a reward voxel collects it (scenario_collect.cpp:145-178)."""
    s, state = _single_env("Collect", seed=3)
    sc = state.scen
    active = np.asarray(sc.reward_active)
    assert active.any()
    r = int(np.nonzero(active)[0][0])
    voxel = np.asarray(sc.reward_voxel)[r]
    # teleport the agent into the reward voxel
    apos = jnp.asarray([[voxel[0] + 0.5, voxel[1] + 0.4, voxel[2] + 0.5]])
    state = state.replace(agents=state.agents.replace(pos=apos))
    shaping = jnp.asarray(s.shaping_array())
    state2, rew = s.scen_step(state, jnp.zeros((1,), jnp.int32), shaping)
    val = float(np.asarray(sc.reward_val)[r])
    assert not bool(np.asarray(state2.scen.reward_active)[r])
    assert float(rew[0]) == pytest.approx(val, abs=1e-4)


def test_boxagone_tile_expires():
    """Standing on a tile arms it; it disappears after 15 ticks."""
    from megaverse_tpu.scenarios.box_a_gone import tile_cell

    s, state = _single_env("BoxAGone", seed=4)
    sc = state.scen
    t0 = 0  # tiles are stored in generation order; tile 0 always exists
    cell0 = tile_cell(sc, t0)
    voxel = np.asarray(sc.tile_voxel)[t0]
    # stand on top of the tile voxel (voxel size 2)
    apos = jnp.asarray([[(voxel[0] + 0.5) * 2, (voxel[1] + 1) * 2 + C.AGENT_HALF_HEIGHT,
                         (voxel[2] + 0.5) * 2]])
    agents = state.agents.replace(pos=apos, on_ground=jnp.asarray([True]))
    state = state.replace(agents=agents)
    shaping = jnp.asarray(s.shaping_array())
    act = jnp.zeros((1,), jnp.int32)
    for i in range(16):
        state, rew = s.scen_step(state, act, shaping)
        state = state.replace(agents=state.agents.replace(on_ground=jnp.asarray([True])))
    assert not bool(np.asarray(state.scen.tile_active).reshape(-1)[cell0])
    # voxel no longer solid
    cols = np.asarray(state.cols)
    x, y, z = voxel
    assert not ((cols[x, y >> 5, z] >> (y & 31)) & 1)


def test_tower_reward_formula():
    """calculateTowerReward: sum over boxes in the zone of
    height*0.05 + min(0.05*2^h, 20) (scenario_tower_building.cpp:232-258);
    first-pickup reward fires once per agent."""
    s, state = _single_env("TowerBuilding", seed=7)
    sc = state.scen
    zone = np.asarray(sc.zone)  # [x0, x1, z0, z1]
    vobj = np.asarray(state.vobj).copy()
    vobj[:] = 0
    # stack three boxes at heights 1..3 inside the zone
    x, z = int(zone[0]), int(zone[2])
    for y in (1, 2, 3):
        vobj[x, y, z] = 1
    state = state.replace(vobj=jnp.asarray(vobj))
    got = float(s._tower_reward(state, sc.zone))
    want = sum(y * 0.05 + min(0.05 * 2.0 ** y, 20.0) for y in (1, 2, 3))
    assert got == pytest.approx(want, abs=1e-5)
    # the per-height coefficient saturates at 20
    from megaverse_tpu.scenarios.tower_building import _height_coeff
    assert float(_height_coeff(jnp.asarray(30.0))) == pytest.approx(
        30 * 0.05 + 20.0)


def test_football_kick_and_push():
    """Interact within 1.8 m kicks the ball away (70 N, up-bias,
    scenario_football.cpp:143-164); walking contact pushes it out of
    penetration (Bullet kinematic-vs-dynamic analogue)."""
    s, state = _single_env("Football", seed=6)
    ball0 = np.asarray(state.scen.ball_pos)
    shaping = jnp.asarray(s.shaping_array())

    # stand 1 m -x of the ball, kick
    apos = jnp.asarray([[ball0[0] - 1.0, ball0[1] - C.AGENT_BODY_OFFSET_Y,
                         ball0[2]]])
    st = state.replace(agents=state.agents.replace(pos=apos))
    st2, _ = s.scen_step(st, jnp.asarray([C.ACTION_INTERACT], jnp.int32),
                         shaping)
    v = np.asarray(st2.scen.ball_vel)
    assert v[0] > 1.0 and v[1] > 0.5, v  # away from agent, up-bias

    # rest the ball on the floor, overlap the agent capsule with it: pushed
    sc = state.scen
    rest = sc.replace(ball_pos=jnp.asarray([6.0, 2.0, 6.0]),
                      ball_vel=jnp.zeros(3))
    apos = jnp.asarray([[6.0 + 1.1, 2.0 - C.AGENT_HALF_HEIGHT, 6.0]])
    st = state.replace(scen=rest, agents=state.agents.replace(pos=apos))
    st2, _ = s.scen_step(st, jnp.zeros((1,), jnp.int32), shaping)
    moved = np.asarray(st2.scen.ball_pos) - np.asarray(rest.ball_pos)
    assert moved[0] < -0.01, moved  # pushed away (-x) from the agent


def test_hexexplore_solve():
    s, state = _single_env("HexExplore", seed=5)
    target = np.asarray(state.scen.reward_pos)
    apos = jnp.asarray([[target[0], C.AGENT_HALF_HEIGHT, target[2]]])
    state = state.replace(agents=state.agents.replace(pos=apos))
    shaping = jnp.asarray(s.shaping_array())
    state2, rew = s.scen_step(state, jnp.zeros((1,), jnp.int32), shaping)
    assert bool(np.asarray(state2.scen.solved))
    assert float(rew[0]) == pytest.approx(5.0)
    assert float(state2.true_objective[0]) == 1.0


def test_boxagone_tile_height_deviation_is_reward_neutral():
    """PARITY deviation: tiles here are full voxels (agents stand one voxel
    HIGHER than on the reference's thin mid-voxel boxes). Proof of reward
    neutrality: for every reachable level height h (first level h=1; later
    levels h = 1 + randRange(2,4)·k >= 3, scenario_box_a_gone.cpp:58-67),
    the touches-floor classification (coords.y < 3, cpp:106) and the armed
    tile's identity agree between the two geometries."""
    for h in [1, 3, 4, 5, 6, 7]:          # reachable level heights
        ref_agent_voxel = int(np.floor((2 * h + 1 + 0.855) / 2.0))   # thin tile
        my_agent_voxel = int(np.floor((2 * h + 2 + 0.855) / 2.0))    # voxel top
        assert (ref_agent_voxel < 3) == (my_agent_voxel < 3), h
        # armed tile: reference reads the agent's OWN voxel (cpp:117), we
        # read one below the (one-higher) agent voxel -> the same tile cell
        assert my_agent_voxel - 1 == ref_agent_voxel == h
    # floor standing agrees too (floor slab occupies voxel y=0)
    assert int(np.floor((2 + 0.855) / 2)) < 3
    # h=2 is unreachable: second level = 1 + randRange(2,4) >= 3
    assert all(1 + d >= 3 for d in (2, 3))


def test_stacking_sequential_same_tick_visibility():
    """Reference parity (env.cpp:89-122 + component_object_stacking.hpp):
    agents interact SEQUENTIALLY within one tick, so when two agents target
    the same object the first picks it and the second sees it gone — and a
    box placed by agent 0 occupies its voxel for agent 1's placement checks
    in the same tick."""
    from megaverse_tpu.scenarios.components import object_stacking_step

    s, state = _single_env("TowerBuilding", seed=2, num_agents=2)
    cfg = s.cfg.grid
    vobj = np.asarray(state.vobj)
    xs, ys, zs = np.nonzero(vobj)
    cols = np.asarray(state.cols)
    solid = lambda x, y, z: (cols[x, y >> 5, z] >> (y & 31)) & 1
    found = None
    for x, y, z in zip(xs, ys, zs):
        # free approach cell, and nothing above the box OR its approach
        # column (so the 2-voxel pick scan sees exactly one candidate)
        if (x >= 2 and vobj[x - 1, y, z] == 0 and not solid(x - 1, y, z)
                and vobj[x, y + 1, z] == 0 and vobj[x - 1, y + 1, z] == 0):
            found = (int(x), int(y), int(z))
            break
    assert found is not None
    bx, by, bz = found
    # BOTH agents stand at the same spot facing the same box
    apos = jnp.asarray([[bx - 1 + 0.5, by + C.AGENT_HALF_HEIGHT, bz + 0.5]] * 2)
    agents = state.agents.replace(pos=apos, yaw=jnp.asarray([-np.pi / 2] * 2))
    state = state.replace(agents=agents)
    action = jnp.asarray([C.ACTION_INTERACT, C.ACTION_INTERACT], jnp.int32)
    res = object_stacking_step(cfg, state, action)
    picked = np.asarray(res.picked)
    # exactly ONE agent (the first) gets the object
    assert picked.tolist() == [True, False]
    assert int(res.state.agents.carried[0]) >= 0
    assert int(res.state.agents.carried[1]) == -1


def test_sokoban_sequential_same_tick_visibility():
    """Reference parity (scenario_sokoban.cpp:168-233): pushes resolve in
    agent order within one tick. Agent 0 pushing box A out of a cell frees
    it for agent 1's push INTO that cell the same tick (and, conversely, a
    box pushed into a cell blocks a later agent's push toward it)."""
    from megaverse_tpu.ops import grid as G

    s, state = _single_env("Sokoban", seed=1, num_agents=2)
    cfg = s.cfg.grid

    def clean_board(state):
        # strip the level's boxes/walls; keep floor + physics props
        vobj = jnp.zeros_like(state.vobj)
        sc = state.scen.replace(
            wall=jnp.zeros_like(state.scen.wall),
            goal=jnp.zeros_like(state.scen.goal),
            num_boxes=jnp.int32(2), boxes_on_goal=jnp.int32(0))
        return state.replace(vobj=vobj, scen=sc)

    def place_box(state, prop_idx, cell):
        x, y, z = cell
        vobj = state.vobj.at[x, y, z].set(prop_idx + 1)
        pos = state.props.pos.at[prop_idx].set(
            jnp.asarray([(x + 0.5) * 2.0, (y + 0.2) * 2.0, (z + 0.5) * 2.0]))
        return state.replace(vobj=vobj,
                             props=state.props.replace(pos=pos))

    def agents_at(state, cells, yaws):
        apos = jnp.asarray([[(c[0] + 0.5) * 2.0, 2.0 + C.AGENT_HALF_HEIGHT,
                             (c[2] + 0.5) * 2.0] for c in cells])
        return state.replace(agents=state.agents.replace(
            pos=apos, yaw=jnp.asarray(yaws, jnp.float32)))

    shaping = jnp.asarray(s.shaping_array())
    action = jnp.asarray([C.ACTION_INTERACT, C.ACTION_INTERACT], jnp.int32)

    # Case 1: agent 0 pushes box A (5,1,5)->(5,1,6) [+z]; agent 1 pushes
    # box B (4,1,5)->(5,1,5) [+x] into A's just-freed cell. Sequential:
    # both pushes succeed.
    st = clean_board(state)
    st = place_box(st, 0, (5, 1, 5))
    st = place_box(st, 1, (4, 1, 5))
    st = agents_at(st, [(5, 1, 4), (3, 1, 5)], [np.pi, -np.pi / 2])
    # sanity: facing voxels are the boxes
    from megaverse_tpu.scenarios.components import pickup_spot
    spot = G.world_to_voxel(cfg, pickup_spot(st.agents))
    np.testing.assert_array_equal(np.asarray(spot),
                                  [[5, 1, 5], [4, 1, 5]])
    st2, _ = s.scen_step(st, action, shaping)
    vobj2 = np.asarray(st2.vobj)
    assert vobj2[5, 1, 6] == 1      # box A moved +z
    assert vobj2[5, 1, 5] == 2      # box B took its cell
    assert vobj2[4, 1, 5] == 0

    # Case 2: agent 0 pushes box A (5,1,4)->(5,1,5) [+z]; agent 1's push of
    # box B (4,1,5)->(5,1,5) is then BLOCKED by A in the same tick.
    st = clean_board(state)
    st = place_box(st, 0, (5, 1, 4))
    st = place_box(st, 1, (4, 1, 5))
    st = agents_at(st, [(5, 1, 3), (3, 1, 5)], [np.pi, -np.pi / 2])
    st2, _ = s.scen_step(st, action, shaping)
    vobj2 = np.asarray(st2.vobj)
    assert vobj2[5, 1, 5] == 1      # box A moved in first
    assert vobj2[4, 1, 5] == 2      # box B did not move
    assert vobj2[5, 1, 6] == 0


def test_boxagone_sequential_same_tick_arming():
    """Reference parity (scenario_box_a_gone.cpp:100-148): the agent loop is
    sequential, so if agent 0 arms tile T (15 ticks) and agent 1 LEAVES T in
    the same tick, agent 1's previous-tile acceleration clips the fresh
    timer to 3. A parallel clip-then-arm pass would leave it at 15."""
    from megaverse_tpu.scenarios.box_a_gone import num_tiles, tile_cell

    s, state = _single_env("BoxAGone", seed=3, num_agents=2)
    sc = state.scen
    tv = np.asarray(sc.tile_voxel)
    n = num_tiles(sc)
    cells = np.asarray([tile_cell(sc, t) for t in range(n)])
    active = np.asarray(sc.tile_active).reshape(-1)[cells]  # per tile index
    # two adjacent active tiles on the same level
    t_T = t_U = None
    for i in np.nonzero(active)[0]:
        j = np.nonzero(active & (tv[:n, 1] == tv[i, 1])
                       & (np.abs(tv[:n, 0] - tv[i, 0])
                          + np.abs(tv[:n, 2] - tv[i, 2]) == 1))[0]
        if j.size:
            t_T, t_U = int(i), int(j[0])
            break
    assert t_T is not None
    cell_T, cell_U = int(cells[t_T]), int(cells[t_U])
    VOXEL = 2.0
    # agent 0 arrives on T this tick (last_tile -1, unarmed T); agent 1 was
    # standing on T and arrives on U this tick
    sc = sc.replace(last_tile=jnp.asarray([-1, cell_T], jnp.int32),
                    tile_ticks=jnp.full_like(sc.tile_ticks, -1))
    top = lambda t: jnp.asarray([
        (tv[t][0] + 0.5) * VOXEL, (tv[t][1] + 1) * VOXEL + C.AGENT_HALF_HEIGHT,
        (tv[t][2] + 0.5) * VOXEL])
    apos = jnp.stack([top(t_T), top(t_U)])
    state = state.replace(
        scen=sc,
        agents=state.agents.replace(
            pos=apos, on_ground=jnp.asarray([True, True])))
    shaping = jnp.asarray(s.shaping_array())
    st2, _ = s.scen_step(state, jnp.zeros((2,), jnp.int32), shaping)
    ticks2 = np.asarray(st2.scen.tile_ticks).reshape(-1)
    # T was armed at 15 by agent 0, clipped to 3 by agent 1's departure,
    # then ticked down once -> 2; U armed at 15 -> 14.
    assert ticks2[cell_T] == 2
    assert ticks2[cell_U] == 14
    assert np.asarray(st2.scen.last_tile).tolist() == [cell_T, cell_U]


def test_football_rigid_body_roll_and_no_bounce():
    """The ball is an impulse-based rigid body with the reference's Bullet
    constants: restitution 0 (never set, Bullet default) -> a dropped ball
    settles without rebounding; sliding friction at the contact point spins
    it up (slide -> roll transition) and slows the slide."""
    s, state = _single_env("Football", seed=6)
    shaping = jnp.asarray(s.shaping_array())
    act = jnp.zeros((1,), jnp.int32)
    far = state.agents.replace(pos=jnp.asarray([[2.0, 0.855, 2.0]]))

    # drop from y=4 onto the floor (top at y=1, rest center = 1 + R = 2)
    sc = state.scen.replace(ball_pos=jnp.asarray([8.0, 4.0, 8.0]),
                            ball_vel=jnp.zeros(3), ball_omega=jnp.zeros(3))
    st = state.replace(scen=sc, agents=far)
    ys = []
    for _ in range(40):
        st, _ = s.scen_step(st, act, shaping)
        ys.append(float(st.scen.ball_pos[1]))
    assert abs(ys[-1] - 2.0) < 0.06, ys[-1]
    assert max(ys[15:]) < 2.1, "restitution-0 ball must not bounce"

    # slide -> roll: horizontal velocity, no spin
    sc = st.scen.replace(ball_pos=jnp.asarray([8.0, 2.0, 8.0]),
                         ball_vel=jnp.asarray([6.0, 0.0, 0.0]),
                         ball_omega=jnp.zeros(3))
    st = st.replace(scen=sc)
    for _ in range(10):
        st, _ = s.scen_step(st, act, shaping)
    v = np.asarray(st.scen.ball_vel)
    w = np.asarray(st.scen.ball_omega)
    assert 0.0 < v[0] < 6.0, v          # friction slows the slide
    assert w[2] < -0.1, w               # contact torque spins it forward
    # approaching the rolling constraint v_x ~ -omega_z * R
    assert abs(v[0] + w[2] * 1.0) < 0.6 * v[0] + 0.3, (v[0], w[2])
