"""Renderer invariants across backends and output formats.

The product render path emits packed int32 RGB straight from separate channel
planes (ops/raycast.py pack_planes); these tests pin that every route to a
pixel — packed vs stacked uint8, unroll vs rolled table scan, single- vs
multi-agent tables — produces identical bytes, and that the
single-agent own-body row skip never changes an image (the camera sits inside
the body/eye volumes, whose inside hits are culled).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import megaverse_tpu.constants as C
from megaverse_tpu.env import render_batch, render_custom_camera
from megaverse_tpu.ops import raycast as R
from megaverse_tpu.ops import raycast_pallas as RP
from megaverse_tpu.vector_env import VectorEnv


def _env_state(name="Collect", num_envs=2, num_agents=2, seed=7, steps=3):
    env = VectorEnv(name, num_envs=num_envs, num_agents_per_env=num_agents,
                    seed=seed, render=False)
    env.reset()
    rng = np.random.default_rng(0)
    for _ in range(steps):
        md = np.stack([rng.integers(0, s, size=(num_envs, num_agents))
                       for s in C.ACTION_SPACE_SIZES], axis=-1)
        env.step(md)
    return env


@pytest.mark.render_heavy
def test_packed_equals_stacked_rgb():
    env = _env_state()
    st = env.state
    for backend in ("unroll", "xla"):
        packed = np.asarray(render_batch(env.scenario, st, backend=backend,
                                         fmt="packed"))
        rgb = np.asarray(render_batch(env.scenario, st, backend=backend,
                                      fmt="rgb"))
        unpacked = np.stack(
            [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF],
            axis=-1).astype(np.uint8)
        np.testing.assert_array_equal(unpacked, rgb)


def test_unroll_equals_table_backend():
    env = _env_state()
    st = env.state
    u = np.asarray(render_batch(env.scenario, st, backend="unroll", fmt="packed"))
    x = np.asarray(render_batch(env.scenario, st, backend="xla", fmt="packed"))
    np.testing.assert_array_equal(u, x)


@pytest.mark.render_heavy
def test_single_agent_row_skip_is_invisible():
    """A==1 drops the own body/eye rows; the image must match a table that
    keeps them (they are always inside-culled for the own camera)."""
    env = _env_state(num_agents=1)
    st = env.state
    cfg = env.scenario.cfg
    remaining = jnp.maximum(
        0.0, (st.episode_len_sec - st.episode_sec) / st.episode_len_sec)

    def packed_with_agents(keep):
        prims = jax.vmap(
            lambda s: RP.build_prim_table(
                cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents,
                include_agent_rows=keep)
        )(st)
        return np.asarray(jax.vmap(
            lambda s, p, tf: R.render_table_packed(cfg, s.agents, p, tf)
        )(st, prims, remaining))

    np.testing.assert_array_equal(packed_with_agents(True),
                                  packed_with_agents(False))


def test_overview_camera_shows_agent_body():
    """The overview/hires camera keeps agent rows: an outside viewpoint looking
    at the agent must see body pixels that vanish if agent rows are dropped."""
    env = _env_state(name="Empty", num_agents=1, steps=0)
    st1 = jax.tree.map(lambda x: x[0], env.state)
    pos = np.asarray(st1.agents.pos)[0]
    eye = pos + np.asarray([0.0, 2.0, 4.0])
    img = np.asarray(render_custom_camera(
        env.scenario, st1, eye, yaw=0.0, pitch=-0.45, width=128, height=72))
    assert img.shape == (72, 128, 3)
    agent_rgb = (np.asarray(C.PALETTE[C.AGENT_COLORS[0]]) * 255).astype(int)
    # some pixels approximate the agent body palette color under shading
    close = (np.abs(img.astype(int) - agent_rgb).sum(-1) < 180)
    assert close.any(), "agent body not visible from overview camera"


@pytest.mark.parametrize("scenario", ["Collect", "HexMemory"])
@pytest.mark.render_heavy
def test_pallas_cluster_cull_is_exact(scenario):
    """The cluster-culled Pallas kernel (interpret mode) must produce exactly
    the same packed pixels as the unculled kernel and the XLA table backend:
    culling may only skip primitives that cannot beat the current closest
    hit. HexMemory covers rotated-box walls + cylinder/cone/sphere props."""
    import dataclasses

    env = _env_state(name=scenario, num_envs=2, num_agents=2, steps=3)
    st = env.state
    # The culling contracts are resolution-independent; 24 px keeps 3 tile
    # rows (multi-tile traversal) at 1/3 the interpret-mode ray cost.
    cfg = dataclasses.replace(env.scenario.cfg, obs_height=24)
    remaining = jnp.maximum(
        0.0, (st.episode_len_sec - st.episode_sec) / st.episode_len_sec)
    prims = jax.vmap(
        lambda s: RP.build_prim_table(
            cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents)
    )(st)
    cams = jax.vmap(lambda s, tf: RP.build_cams(cfg, s.agents, tf))(
        st, remaining)

    plain = np.asarray(RP.render_packed(
        cams, prims, cfg.obs_height, cfg.obs_width, interpret=True))
    prims_p, clusters = jax.vmap(RP.build_clusters)(prims)
    culled = np.asarray(RP.render_packed(
        cams, prims_p, cfg.obs_height, cfg.obs_width, clusters=clusters,
        interpret=True))
    np.testing.assert_array_equal(culled, plain)

    # Front-to-back traversal must also be bit-exact (row-index tie-break).
    order, dist = RP.sort_clusters(cams, clusters)
    srt = np.asarray(RP.render_packed(
        cams, prims_p, cfg.obs_height, cfg.obs_width, clusters=clusters,
        order=order, interpret=True))
    np.testing.assert_array_equal(srt, plain)
    # ...and early ray termination (front-to-back + per-cluster distance
    # lower bounds + far-plane depth init) may only skip clusters that could
    # never change a pixel.
    ee = np.asarray(RP.render_packed(
        cams, prims_p, cfg.obs_height, cfg.obs_width, clusters=clusters,
        order=order, dist=dist, interpret=True))
    np.testing.assert_array_equal(ee, plain)
    # ...and per-tile frustum-culled lists (conservative interval slab test:
    # a cluster only drops from a tile's list when NO ray of that tile can
    # hit it in front of the camera inside the far plane).
    order_t, dist_t = RP.frustum_cull(
        cams, clusters, cfg.obs_height, cfg.obs_width)
    assert order_t.ndim == 4
    # real culling happens (some tiles see fewer live clusters than exist):
    # culled clusters carry dist = sqrt(INF) = 1e15
    assert (np.asarray(dist_t) > 1e14).any()
    tiled = np.asarray(RP.render_packed(
        cams, prims_p, cfg.obs_height, cfg.obs_width, clusters=clusters,
        order=order_t, dist=dist_t, interpret=True))
    np.testing.assert_array_equal(tiled, plain)
    # ...regardless of the visit order chosen.
    rng2 = np.random.default_rng(1)
    perm = jnp.asarray(np.stack(
        [np.stack([rng2.permutation(clusters.shape[1]) for _ in range(2)])
         for _ in range(2)]).astype(np.int32))
    shuf = np.asarray(RP.render_packed(
        cams, prims_p, cfg.obs_height, cfg.obs_width, clusters=clusters,
        order=perm, interpret=True))
    np.testing.assert_array_equal(shuf, plain)

    # ...and the two-level supercluster path (per-tile lists over
    # superclusters; the kernel prunes SUPER_K*CLUSTER_K rows per vector
    # test, members re-test individually).
    clusters_p, sclusters = jax.vmap(RP.build_superclusters)(clusters)
    order_s, dist_s = RP.frustum_cull(
        cams, sclusters, cfg.obs_height, cfg.obs_width)
    sup = np.asarray(RP.render_packed(
        cams, prims_p, cfg.obs_height, cfg.obs_width, clusters=clusters_p,
        order=order_s, dist=dist_s, sclusters=sclusters, interpret=True))
    np.testing.assert_array_equal(sup, plain)

    # ...and the bit-walk path (packed per-tile survival bitmasks, scalar-only
    # in-kernel control flow — the production default, MEGAVERSE_RENDER_MODE).
    prims_b = jax.vmap(RP.pad_prims_to_clusters)(prims_p, clusters_p)
    scbits, clbits, scdist, cdist = RP.cull_bits(
        cams, clusters_p, cfg.obs_height, cfg.obs_width)
    # real culling happens: some tiles drop some live clusters
    popcount = np.array([bin(int(w) & 0xFFFFFFFF).count("1")
                         for w in np.asarray(clbits).ravel()]).sum()
    assert popcount < np.prod(clbits.shape[:3]) * clusters_p.shape[1]
    bits = np.asarray(RP.render_packed(
        cams, prims_b, cfg.obs_height, cfg.obs_width, clusters=clusters_p,
        scbits=scbits, clbits=clbits, scdist=scdist, cdist=cdist,
        interpret=True))
    np.testing.assert_array_equal(bits, plain)

    # Cross-backend (kernel vs XLA table): same math, but interpret-mode op
    # ordering can differ by an ulp on hit-boundary pixels — allow isolated
    # one-step channel deltas, nothing more.
    table = np.asarray(jax.vmap(
        lambda s, p, tf: R.render_table_packed(cfg, s.agents, p, tf)
    )(st, prims, remaining))
    unpack = lambda p: np.stack(
        [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF], -1).astype(np.int32)
    delta = np.abs(unpack(plain) - unpack(table))
    assert (delta <= 1).all(), f"max channel delta {delta.max()}"
    assert (delta != 0).mean() < 1e-4, f"diff fraction {(delta != 0).mean()}"


def test_frustum_cull_is_conservative():
    """Property check on the interval slab test: for every pixel of every
    tile, if the per-ray slab test (the kernel's math) reaches a cluster in
    front of the camera inside the far plane, that cluster must SURVIVE the
    tile's frustum cull."""
    env = _env_state(name="Collect", num_envs=2, num_agents=2, steps=4)
    st = env.state
    cfg = env.scenario.cfg
    remaining = jnp.maximum(
        0.0, (st.episode_len_sec - st.episode_sec) / st.episode_len_sec)
    prims = jax.vmap(
        lambda s: RP.build_prim_table(
            cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents)
    )(st)
    cams = jax.vmap(lambda s, tf: RP.build_cams(cfg, s.agents, tf))(
        st, remaining)
    prims_p, clusters = jax.vmap(RP.build_clusters)(prims)
    order, dist = RP.frustum_cull(cams, clusters, cfg.obs_height, cfg.obs_width)
    surv = np.asarray(dist) < 1e14                # [B, A, T, G] (order-space)
    ord_np = np.asarray(order)
    cl = np.asarray(clusters)
    cam = np.asarray(cams)
    H, W = cfg.obs_height, cfg.obs_width

    # per-pixel ray dirs, numpy float64 (the kernel's formulas)
    rows = np.arange(H)[:, None]
    cols = np.arange(W)[None, :]
    tan_h = np.tan(np.deg2rad(C.CAMERA_FOV_DEG / 2))
    tan_v = tan_h * H / W
    u = ((cols + 0.5) / W * 2 - 1) * tan_h
    v = (1 - (rows + 0.5) / H * 2) * tan_v
    il = 1 / np.sqrt(u * u + v * v + 1)
    d0 = np.stack(np.broadcast_arrays(u * il, v * il, -il + 0 * u), -1)

    rng = np.random.default_rng(0)
    for b in range(2):
        for a in range(2):
            ex, ey, ez, yaw, pitch = cam[b, a, :5]
            cy, sy, cp, sp = np.cos(yaw), np.sin(yaw), np.cos(pitch), np.sin(pitch)
            y1 = cp * d0[..., 1] - sp * d0[..., 2]
            z1 = sp * d0[..., 1] + cp * d0[..., 2]
            d = np.stack([cy * d0[..., 0] + sy * z1, y1,
                          -sy * d0[..., 0] + cy * z1], -1)
            # sample pixels; exact slab test per cluster
            for _ in range(200):
                py, px = int(rng.integers(H)), int(rng.integers(W))
                t_i = py // RP.TILE_H
                dd = d[py, px]
                with np.errstate(divide="ignore"):
                    inv = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
                t1 = (cl[b, :, 0:3] - [ex, ey, ez]) * inv
                t2 = (cl[b, :, 3:6] - [ex, ey, ez]) * inv
                tmin = np.minimum(t1, t2).max(-1)
                tmax = np.maximum(t1, t2).min(-1)
                reach = (tmax >= tmin) & (tmax > 0) & (tmin < C.CAMERA_FAR)
                # map cluster-id reachability into order-space survival
                surv_ids = set(ord_np[b, a, t_i][surv[b, a, t_i]])
                bad = [g for g in np.nonzero(reach)[0] if g not in surv_ids]
                assert not bad, (b, a, py, px, bad)


@pytest.mark.render_heavy
def test_cluster_table_bounds_are_conservative():
    """Every live row's exact hit distances must be reachable through its
    cluster AABB: shrink-proof check on randomly sampled rays."""
    env = _env_state(name="Rearrange", num_envs=1, num_agents=2, steps=2)
    st = jax.tree.map(lambda x: x[0], env.state)
    cfg = env.scenario.cfg
    prims = RP.build_prim_table(
        cfg, st.box_lo, st.box_hi, st.box_color, st.props, st.agents)
    prims_p, clusters = RP.build_clusters(prims)
    prims_np = np.asarray(prims_p)
    cl = np.asarray(clusters)
    k = RP.CLUSTER_K
    for g in range(cl.shape[0]):
        rows = prims_np[g * k:(g + 1) * k]
        live = rows[rows[:, 0] >= 0]
        if live.size == 0:
            continue
        lo, hi = cl[g, :3], cl[g, 3:6]
        assert (lo <= hi).all()
        for row in live:
            c = row[1:4]
            if int(row[0]) == RP.PRIM_AABB:
                assert (row[1:4] >= lo - 1e-4).all(), (g, row)
                assert (row[4:7] <= hi + 1e-4).all(), (g, row)
            else:
                # center must lie inside the cluster box
                assert (c >= lo - 1e-4).all() and (c <= hi + 1e-4).all(), (g, row)


def test_pow_shininess_matches_float_pow():
    x = jnp.linspace(0.0, 1.0, 1000)
    got = np.asarray(R.pow_shininess(x))
    want = np.asarray(x, np.float64) ** C.LIGHT_SHININESS
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-30)


def test_ui_reward_indicators():
    """useUIRewardIndicators draws the green/red reward quads
    (scenario_default.hpp:147-162, 171-186): green strip left of center for
    positive lastReward, red right of center for negative, absent at zero and
    when the param is off — identical across all three backends."""
    env = VectorEnv("Empty", num_envs=3, num_agents_per_env=1, seed=5,
                    render=False,
                    params={C.P_USE_UI_REWARD_INDICATORS: 1.0})
    env.reset()
    st = env.state.replace(
        last_reward=jnp.asarray([[2.0], [-1.5], [0.0]], jnp.float32))
    cfg = env.scenario.cfg

    imgs = {}
    for backend in ("unroll", "xla"):
        imgs[backend] = np.asarray(
            render_batch(env.scenario, st, backend=backend, fmt="packed"))
    np.testing.assert_array_equal(imgs["unroll"], imgs["xla"])

    # pallas kernel path (interpret mode on CPU)
    remaining = jnp.maximum(
        0.0, (st.episode_len_sec - st.episode_sec) / st.episode_len_sec)
    cams = jax.vmap(lambda s, tf: RP.build_cams(cfg, s.agents, tf,
                                                s.last_reward))(st, remaining)
    prims = jax.vmap(
        lambda s: RP.build_prim_table(cfg, s.box_lo, s.box_hi, s.box_color,
                                      s.props, s.agents,
                                      include_agent_rows=False))(st)
    pk = np.asarray(RP.render_packed(cams, prims, cfg.obs_height,
                                     cfg.obs_width, interpret=True,
                                     ui_indicators=True))
    np.testing.assert_array_equal(pk, imgs["unroll"])

    def count_color(img, name):
        col = np.asarray(C.PALETTE[C.COLOR_IDX[name]]) * (0.3 + C.LIGHT_COLOR[0])
        target = (np.clip(col, 0, 1) * 255 + 0.5).astype(np.int64)
        packed = (target[0] << 16) | (target[1] << 8) | target[2]
        return int((img == packed).sum())

    base = np.asarray(render_batch(
        env.scenario, env.state, backend="unroll", fmt="packed"))
    assert count_color(imgs["unroll"][0], "GREEN") > 0       # positive reward
    assert count_color(imgs["unroll"][0], "RED") == 0
    assert count_color(imgs["unroll"][1], "RED") > 0         # negative reward
    assert count_color(imgs["unroll"][1], "GREEN") == 0
    assert count_color(imgs["unroll"][2], "GREEN") == 0      # zero reward
    assert count_color(imgs["unroll"][2], "RED") == 0
    assert count_color(base[0], "GREEN") == 0                # zero at reset
    # bigger |reward| -> taller quad
    assert count_color(imgs["unroll"][0], "GREEN") > count_color(
        imgs["unroll"][1], "RED")

    # param off -> no indicators even with nonzero lastReward
    env_off = VectorEnv("Empty", num_envs=1, num_agents_per_env=1, seed=5,
                        render=False)
    env_off.reset()
    st_off = env_off.state.replace(
        last_reward=jnp.asarray([[2.0]], jnp.float32))
    img_off = np.asarray(render_batch(
        env_off.scenario, st_off, backend="unroll", fmt="packed"))
    assert count_color(img_off[0], "GREEN") == 0


def test_fused_wall_matches_two_rotbox_rows():
    """PROP_ROTBOX_WALL fuses a hex wall and its derived bottom edging into
    one primitive row (scenarios/hex.py build_maze). The image must match
    rendering the same geometry as TWO separate PROP_ROTBOX rows (the round-3
    pre-fusion representation) up to sub-ulp slab arithmetic: the fused path
    expresses the edging bounds relative to the wall center instead of the
    edging center, so t values can differ in the last float bit."""
    env = _env_state(name="Empty", num_envs=1, num_agents=1, steps=0)
    cfg = env.scenario.cfg
    st = jax.tree.map(lambda x: x[0], env.state)
    agents = st.agents
    # camera at origin looking -z; wall 4 m in front, slightly rotated
    agents = agents.replace(
        pos=jnp.asarray([[0.0, 0.6, 0.0]], jnp.float32),
        yaw=jnp.asarray([0.15], jnp.float32),
        pitch=jnp.asarray([-0.1], jnp.float32))

    pal8 = np.round(np.asarray(C.PALETTE) * 255.0).astype(np.int64)
    packed = (pal8[:, 0] << 16) | (pal8[:, 1] << 8) | pal8[:, 2]
    wall_col = float(packed[C.COLOR_IDX["DARK_BLUE"]])
    edge_col = float(packed[C.COLOR_IDX["ORANGE"]])

    cx, cz = 0.6, -4.0
    hx, hy, hz = 1.75, 1.1, 0.15
    yaw = 0.7
    cyj, syj = np.cos(np.float32(yaw)), np.sin(np.float32(yaw))

    fused = np.zeros((2, 12), np.float32)
    fused[:, 0] = -1
    fused[0] = [RP.PRIM_ROTBOX_WALL, cx, hy, cz, yaw, cyj, syj,
                wall_col, hx, hy, hz, edge_col]

    split = np.zeros((2, 12), np.float32)
    split[0] = [RP.PRIM_ROTBOX, cx, hy, cz, yaw, cyj, syj,
                wall_col, hx, hy, hz, 0.0]
    e_hx = hx * C.WALL_EDGE_LEN_SCALE
    e_hy = hy * C.WALL_EDGE_H_FRAC
    split[1] = [RP.PRIM_ROTBOX, cx, e_hy, cz, yaw, cyj, syj,
                edge_col, e_hx, e_hy, C.WALL_EDGE_HZ, 0.0]

    tf = jnp.asarray(1.0, jnp.float32)
    img_f = np.asarray(R.render_table_packed(
        cfg, agents, jnp.asarray(fused), tf))
    img_s = np.asarray(R.render_table_packed(
        cfg, agents, jnp.asarray(split), tf))
    # Both wall face and edging strip must actually be visible. Shading
    # recolors the packed albedos, so check structure instead of raw colors:
    # the split render draws the edging as its own row, so pixels where the
    # split image shows the edging-row color family form a nonempty band,
    # and the fused render must show the same distinct-color set.
    sky = img_s[0, 0, 0]  # corner pixel: sky (camera pitched up, wall below)

    def major_colors(img):
        vals, counts = np.unique(img, return_counts=True)
        return {int(v) for v, c in zip(vals, counts) if c >= 10 and v != sky}

    cols_s = major_colors(img_s)
    cols_f = major_colors(img_f)
    assert len(cols_s) >= 2, "expected wall + edging shades in split render"
    assert cols_f == cols_s, "fused render shows different color set"
    same = (img_f == img_s).mean()
    assert same > 0.999, f"fused wall diverges from two-row render: {same}"
    diff = img_f != img_s
    if diff.any():
        # differing pixels must be off by at most 2 per channel (one ulp of
        # hit t can shift the shaded value across two rounding boundaries)
        a = np.stack([(img_f >> s) & 0xFF for s in (16, 8, 0)], -1).astype(int)
        b = np.stack([(img_s >> s) & 0xFF for s in (16, 8, 0)], -1).astype(int)
        assert np.abs(a - b).max() <= 2
