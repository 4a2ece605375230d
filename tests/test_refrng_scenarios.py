"""Reference-stream layout parity for scenarios with generate_ref.

Golden values produced by tests/golden/tower_golden.cpp — a draw-for-draw
libstdc++ replica of the reference TowerBuilding episode sequence
(Env::reset reseed -> TowerBuildingScenario::reset -> platform init ->
candidate shuffle -> wall color/bool -> spawnAgents yaws)."""

import numpy as np

from megaverse_tpu import constants as C
from megaverse_tpu.scenarios import make_scenario
from megaverse_tpu.utils.refrng import Rng, episode_reseed, ref_spawn_yaw

EP_SEED = 81935403
DIMS = [5, 15, 24, 3, 6, 2, 3, 9, 9, 10, 5]
CAND_HEAD = [(3, 2, 7), (10, 2, 4), (9, 2, 18), (11, 2, 21), (8, 2, 18),
             (6, 2, 3), (6, 2, 2), (12, 2, 22)]
N_OBJECTS = 1
WALL_IDX = 11
DRAW_WALLS = 1
YAWS = [4.23069382, 1.43952417]


def test_towerbuilding_reference_stream_layout():
    sc = make_scenario("TowerBuilding", num_agents=2)
    rng = Rng(7)
    assert episode_reseed(rng) == EP_SEED
    scene = sc.generate_ref(rng)

    h, length, width, bz_l, bz_w, mat_l, mat_w, bz_x, bz_z, mat_x, mat_z = DIMS
    np.testing.assert_array_equal(
        np.asarray(scene.scen.zone), [bz_x, bz_x + bz_l, bz_z, bz_z + bz_w])
    # floor occupies exactly length x width at y=0
    vt = np.asarray(scene.host_vtype)
    floor = (vt[:, 0, :] & C.VOXEL_SOLID) != 0
    assert floor[:length, :width].all()
    assert not floor[length:, :].any() and not floor[:, width:].any()
    # walls drawn (DRAW_WALLS=1): perimeter voxels at y=1..height-1 solid+opaque
    assert ((vt[0, 1:h, :width] & C.VOXEL_OPAQUE) != 0).all()
    # agents spawn on the first two shuffled candidates (+cell centering,
    # +agent height)
    exp0 = np.asarray(CAND_HEAD[0], np.float64) + [0.5, C.AGENT_HEIGHT, 0.5]
    exp1 = np.asarray(CAND_HEAD[1], np.float64) + [0.5, C.AGENT_HEIGHT, 0.5]
    np.testing.assert_allclose(scene.agent_spawn[0], exp0, atol=1e-6)
    np.testing.assert_allclose(scene.agent_spawn[1], exp1, atol=1e-6)
    # spawn yaws bit-exact in f32
    np.testing.assert_array_equal(
        np.asarray(scene.agent_yaw, np.float32),
        np.asarray(YAWS, np.float32))
    # object count: N_OBJECTS random + materials rectangle bulk
    n_props = int((np.asarray(scene.props.type) != C.PROP_NONE).sum())
    assert n_props == N_OBJECTS + mat_l * mat_w
    # the random object is the next shuffled candidate after the agent slots
    ox, oy, oz = CAND_HEAD[2]
    in_mat = (mat_x <= ox < mat_x + mat_l) and (mat_z <= oz < mat_z + mat_w)
    if not in_mat:
        oy = 1
    pp = np.asarray(scene.props.pos)
    assert any(np.allclose(p, (np.asarray([ox, oy, oz]) + 0.5)) for p in pp[:n_props])


def test_empty_reference_stream_yaws():
    sc = make_scenario("Empty", num_agents=2)
    rng = Rng(7)
    assert episode_reseed(rng) == EP_SEED
    scene = sc.generate_ref(rng)
    # same episode seed: first two frand draws match the tower trace's
    # post-layout position only if the layout drew nothing -- Empty draws
    # ONLY the yaws, so just pin determinism + range here plus a second
    # instance equality.
    sc2 = make_scenario("Empty", num_agents=2)
    rng2 = Rng(7)
    episode_reseed(rng2)
    scene2 = sc2.generate_ref(rng2)
    np.testing.assert_array_equal(scene.agent_yaw, scene2.agent_yaw)
    assert ((np.asarray(scene.agent_yaw) >= 0)
            & (np.asarray(scene.agent_yaw) < 2 * np.pi)).all()


def test_vector_env_reference_mode():
    """rng_mode='reference' drives layouts from the reference seed chain:
    two instances with the same master seed agree bit-exactly; auto-reset
    consumes the per-episode reseed chain deterministically."""
    import jax
    from megaverse_tpu import VectorEnv

    kw = dict(num_envs=2, num_agents_per_env=2, seed=42,
              rng_mode="reference", render=False,
              params={C.P_EPISODE_LENGTH_SEC: 1.0})
    e1, e2 = VectorEnv("Empty", **kw), VectorEnv("Empty", **kw)
    e1.reset(), e2.reset()
    act = np.zeros((2, 2), np.int32)
    for _ in range(20):  # crosses an auto-reset (15-step episodes)
        e1.step(act), e2.step(act)
    np.testing.assert_array_equal(np.asarray(e1.state.agents.yaw),
                                  np.asarray(e2.state.agents.yaw))
    e1.close(), e2.close()


# --- Sokoban (golden: tests/golden/sokoban_golden.cpp, g++ 12 libstdc++) ----

SOKO_GOLD = [
    # (seed, file_idx or None, popped level id, floor idx, yaws)
    (81935403, 900, 0, 1, (1.37102151, 6.08310795)),
    (13084896, None, 1, 1, (0.502104402, 0.231986374)),
    (856369642, None, 2, 4, (5.71843529, 0.586530387)),
    (556844276, 353, 1, 0, (0.792877197, 5.23690701)),
]

# three distinguishable synthetic levels (1/2/3 boxes)
_SOKO_LEVELS = [
    ["##########", "#@$.     #", "#        #", "##########"],
    ["##########", "#@$.$.   #", "#        #", "##########"],
    ["##########", "#@$.$.$. #", "#        #", "##########"],
]


def _fake_source():
    from megaverse_tpu.utils.boxoban import LevelSource

    src = LevelSource.__new__(LevelSource)
    src.files = [f"{i:03d}.txt" for i in range(1000)]
    picked = []

    def parse(path):
        picked.append(path)
        return [list(lv) for lv in _SOKO_LEVELS]

    src._parse = parse
    return src, picked


def test_sokoban_reference_stream_draws():
    """Level-cache refill (randomSample file + std::shuffle), back-pop order,
    floor color and spawn yaws reproduce the libstdc++ golden trace across 4
    resets including a mid-stream cache refill (scenario_sokoban.cpp:81-126)."""
    src, picked = _fake_source()
    rng = Rng(7)
    for seed, file_idx, level_id, floor_idx, yaws in SOKO_GOLD:
        assert episode_reseed(rng) == seed
        rows = src.sample_ref(rng)
        if file_idx is not None:
            assert picked.pop() == f"{file_idx:03d}.txt"
        assert not picked
        assert rows == _SOKO_LEVELS[level_id]
        assert rng.rand_range(0, 5) == floor_idx
        got = [ref_spawn_yaw(rng) for _ in range(2)]
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(yaws, np.float32))


def test_sokoban_reference_stream_layout():
    """generate_ref end-to-end: golden floor color on the scene voxels, golden
    f32 spawn yaws, and the popped level's geometry (box count)."""
    from megaverse_tpu.scenarios.sokoban import _FLOOR_COLORS

    sc = make_scenario("Sokoban", num_agents=2)
    src, _ = _fake_source()
    sc._levels = src
    rng = Rng(7)
    seed, _file, level_id, floor_idx, yaws = SOKO_GOLD[0]
    assert episode_reseed(rng) == seed
    scene = sc.generate_ref(rng)
    assert int(np.asarray(scene.scen.num_boxes)) == level_id + 1
    # golden floor color appears in the merged render boxes (the floor slab)
    assert _FLOOR_COLORS[floor_idx] in np.asarray(scene.box_color)
    np.testing.assert_array_equal(np.asarray(scene.agent_yaw, np.float32),
                                  np.asarray(yaws, np.float32))
    # second reset pops the next level without consuming file/shuffle draws
    assert episode_reseed(rng) == SOKO_GOLD[1][0]
    scene2 = sc.generate_ref(rng)
    assert int(np.asarray(scene2.scen.num_boxes)) == SOKO_GOLD[1][2] + 1
    np.testing.assert_array_equal(
        np.asarray(scene2.agent_yaw, np.float32),
        np.asarray(SOKO_GOLD[1][4], np.float32))


# --- Collect (golden: tests/golden/collect_golden.cpp, built against the
# reference's own siv perlin header + libstdc++ sort/shuffle) ---------------

def test_collect_reference_stream_layout():
    import os

    gold_path = os.path.join(os.path.dirname(__file__), "golden",
                             "collect_golden.txt")
    gold = {}
    with open(gold_path) as f:
        for line in f:
            key, _, rest = line.partition(" ")
            gold[key.rstrip(":")] = rest.strip()
    epseed = int(gold["epseed"])
    (land_i, floor_i, width, length, _freq, _oct, _pseed, _inten,
     gl_hex) = gold["cfg"].split()
    width, length = int(width), int(length)
    heights = np.array(gold["heights"].rstrip(":").split(), np.int64)

    sc = make_scenario("Collect", num_agents=2)
    rng = Rng(7)
    assert episode_reseed(rng) == epseed
    scene = sc.generate_ref(rng)

    # terrain heights: opaque landscape voxels above the floor per column
    # (movable boxes are solid but not opaque — exclude them)
    vt = np.asarray(scene.host_vtype)
    got_h = ((vt[1:length - 1, 1:, 1:width - 1] & C.VOXEL_OPAQUE) != 0).sum(1)
    np.testing.assert_array_equal(got_h.ravel(), heights)

    # agents: golden cells + (.5, agentHeight, .5)
    agl = np.array(gold["agents"].split(), np.float64).reshape(2, 3)
    np.testing.assert_allclose(
        np.asarray(scene.agent_spawn),
        agl + [0.5, C.AGENT_HEIGHT, 0.5], atol=1e-6)
    yaws = np.array(gold["yaws"].split(), np.float32)
    np.testing.assert_array_equal(np.asarray(scene.agent_yaw, np.float32), yaws)

    # rewards: voxel order, count, and good/bad flags bit-for-bit
    rew = np.array(gold["rewards"].split()[1:], np.int64).reshape(-1, 3)
    good = np.array(gold["good"].split(), np.int64)
    scen = scene.scen
    n = rew.shape[0]
    np.testing.assert_array_equal(np.asarray(scen.reward_voxel)[:n], rew)
    np.testing.assert_array_equal(
        np.asarray(scen.reward_val)[:n], np.where(good, 1.0, -1.0))
    assert not np.asarray(scen.reward_active)[n:].any()

    # movable boxes: prop centers = cells + .5, in order
    obj = np.array(gold["objects"].split()[1:], np.float64).reshape(-1, 3)
    from megaverse_tpu.scenarios.collect import OBJ_MAX
    ptypes = np.asarray(scene.props.type)[:OBJ_MAX]
    live = ptypes != C.PROP_NONE
    assert live.sum() == obj.shape[0]
    np.testing.assert_allclose(
        np.asarray(scene.props.pos)[:obj.shape[0]], obj + 0.5, atol=1e-6)


# --- BoxAGone (golden: tests/golden/boxagone_golden.cpp) --------------------

def test_boxagone_reference_stream_layout():
    import os

    gold_path = os.path.join(os.path.dirname(__file__), "golden",
                             "boxagone_golden.txt")
    lines = open(gold_path).read().strip().split("\n")
    epseed = int(lines[0].split()[1])
    num_levels = int(lines[1].split()[1])
    level_tiles, level_h = [], []
    for i in range(num_levels):
        head, _, tiles = lines[2 + i].partition("tiles:")
        level_h.append(int(head.split()[3]))
        level_tiles.append([tuple(map(int, t.split(",")))
                            for t in tiles.split()])
    spawns = np.array(lines[2 + num_levels].split()[1:], np.int64).reshape(2, 3)
    yaws = np.array(lines[3 + num_levels].split()[1:], np.float32)

    sc = make_scenario("BoxAGone", num_agents=2)
    rng = Rng(7)
    assert episode_reseed(rng) == epseed
    scene = sc.generate_ref(rng)

    # tile voxels in generation order (x-major per level)
    exp = np.concatenate([
        np.array([(x, h, z) for (x, z) in tiles], np.int64)
        for h, tiles in zip(level_h, level_tiles)])
    n = exp.shape[0]
    scen = scene.scen
    np.testing.assert_array_equal(np.asarray(scen.tile_voxel)[:n], exp)
    assert int(np.asarray(scen.tile_active).sum()) == n

    # shuffled spawn cells -> world ((v+.5)*voxelSize), standing height
    from megaverse_tpu.scenarios.box_a_gone import VOXEL
    got = np.asarray(scene.agent_spawn)
    np.testing.assert_allclose(got[:, 0], (spawns[:, 0] + 0.5) * VOXEL, atol=1e-6)
    np.testing.assert_allclose(got[:, 2], (spawns[:, 2] + 0.5) * VOXEL, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(scene.agent_yaw, np.float32), yaws)


# --- Football (golden: tests/golden/football_golden.cpp) --------------------

def test_football_reference_stream_layout():
    import os

    gold_path = os.path.join(os.path.dirname(__file__), "golden",
                             "football_golden.txt")
    lines = open(gold_path).read().strip().split("\n")
    head = lines[0].split()
    epseed, length, width, height = (int(head[1]), int(head[3]),
                                     int(head[4]), int(head[5]))
    spawns = np.array(lines[1].split()[1:], np.float64).reshape(2, 3)
    yaws = np.array(lines[2].split()[1:], np.float32)

    sc = make_scenario("Football", num_agents=2)
    rng = Rng(7)
    assert episode_reseed(rng) == epseed
    scene = sc.generate_ref(rng)

    vt = np.asarray(scene.host_vtype)
    floor = (vt[:, 0, :] & C.VOXEL_SOLID) != 0
    assert floor[:length, :width].all()
    assert not floor[length:, :].any() and not floor[:, width:].any()
    # walls at height voxels on the x=0 edge
    assert ((vt[0, :height, :width] & C.VOXEL_SOLID) != 0).all()
    assert not (vt[0, height:, :width] & C.VOXEL_SOLID).any()

    np.testing.assert_allclose(
        np.asarray(scene.agent_spawn),
        spawns + [0.5, C.AGENT_HEIGHT, 0.5], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(scene.agent_yaw, np.float32), yaws)


# --- Rearrange (golden: tests/golden/rearrange_golden.cpp) ------------------

def test_rearrange_reference_stream_layout():
    import os

    gold_path = os.path.join(os.path.dirname(__file__), "golden",
                             "rearrange_golden.txt")
    lines = open(gold_path).read().strip().split("\n")
    head = lines[0].split()
    epseed, height, walls = int(head[1]), int(head[3]), int(head[5])
    items = np.array(lines[1].split()[2:], np.int64).reshape(-1, 5)
    spawns = np.array(lines[2].split()[1:], np.int64).reshape(-1, 2)
    yaws = np.array(lines[3].split()[1:], np.float32)
    offs = np.array(lines[4].split()[3:], np.int64).reshape(-1, 3)

    from megaverse_tpu.scenarios.rearrange import LEFT, RIGHT

    sc = make_scenario("Rearrange", num_agents=2)
    rng = Rng(7)
    assert episode_reseed(rng) == epseed
    scene = sc.generate_ref(rng)
    scen = scene.scen

    n = items.shape[0]
    assert np.asarray(scen.arr_valid).sum() == n
    np.testing.assert_array_equal(np.asarray(scen.arr_shape)[:n], items[:, 0])
    np.testing.assert_array_equal(
        np.asarray(scen.arr_color)[:n], C.OBJECT_COLORS[items[:, 1]])
    np.testing.assert_array_equal(np.asarray(scen.arr_offset)[:n], items[:, 2:])

    # interactive copy placed at RIGHT + golden offsets
    ppos = np.asarray(scene.props.pos)
    for i in range(n):
        idx = int(np.asarray(scen.obj_prop)[i])
        np.testing.assert_allclose(
            ppos[idx], (RIGHT + offs[i]).astype(float) + 0.5, atol=1e-6)

    # agent spawns + yaws
    exp = np.stack([spawns[:, 0] + 0.5, np.full(2, 2.0 + C.AGENT_HEIGHT),
                    spawns[:, 1] + 0.5], 1)
    np.testing.assert_allclose(np.asarray(scene.agent_spawn), exp, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(scene.agent_yaw, np.float32), yaws)

    # walls drawn per the golden randomBool
    vt = np.asarray(scene.host_vtype)
    assert bool((vt[0, 1:height, 1] & C.VOXEL_OPAQUE).any()) == bool(walls)


# --- Obstacles (golden: tests/golden/obstacles_golden.cpp) ------------------

def test_obstacles_reference_stream_draws():
    """The full Obstacles draw stream (platform chain incl. the
    max-difficulty redraw loop, colors, spawn occupancy sampling, box budget
    + object/reward positions, yaws) consumes the mt19937 stream exactly as
    the C++ does: the post-generation probe draws can only match if every
    intermediate draw did."""
    import os

    gold_path = os.path.join(os.path.dirname(__file__), "golden",
                             "obstacles_golden.txt")
    lines = open(gold_path).read().strip().split("\n")
    epseed = int(lines[0].split()[1])
    walls, nplat = int(lines[1].split()[1]), int(lines[1].split()[3])
    plats = [t.split(",") for t in lines[2].split()[1:]]
    colors = tuple(map(int, lines[3].split()[1:]))
    n_obj, n_rew = int(lines[5].split()[1]), int(lines[5].split()[3])
    yaws = np.array(lines[6].split()[1:], np.float32)
    probe = list(map(int, lines[7].split()[1:]))

    kind = {"StartPlatform": "S", "WallPlatform": "W", "LavaPlatform": "L",
            "StepPlatform": "T", "GapPlatform": "G",
            "TransitionPlatform": "A", "ExitPlatform": "E"}

    sc = make_scenario("ObstaclesEasy", num_agents=2)
    rng = Rng(7)
    assert episode_reseed(rng) == epseed
    scene = sc.generate_ref(rng)
    dbg = sc._dbg
    assert dbg["attempt"] == 0  # golden assumes no regeneration
    assert dbg["walls"] == bool(walls) and dbg["n_platforms"] == nplat
    got = [(kind[n], l, w, h) for (n, l, w, h) in dbg["plats"]]
    exp = [(k, int(l), int(w), int(h)) for (k, l, w, h) in plats]
    assert got == exp
    assert dbg["colors"] == colors
    scen = scene.scen
    assert int(np.asarray(scen.reward_active).sum()) == n_rew
    n_boxes = int((np.asarray(scene.props.type)[:sc.BOX_MAX]
                   != C.PROP_NONE).sum())
    assert n_boxes == n_obj
    np.testing.assert_array_equal(np.asarray(scene.agent_yaw, np.float32), yaws)
    # the decisive check: the stream position after generation is identical
    assert [rng.rand_range(0, 1000000) for _ in range(3)] == probe
