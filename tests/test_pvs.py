"""PVS culling contract (utils/pvs.py, ops/pvs.py, render wiring in env.py).

The contract mirrors the reference renderer's: its per-view dirty scan
(v4r_env_renderer.cpp:299-336) never drops geometry a camera could see —
neither may our portal PVS. Three layers are pinned here:

1. conservatism of the host cell-to-cell PVS: a pair of cells marked
   mutually-invisible must admit NO clear straight sightline between them
   (random mazes, sampled sightlines vs the wall segments);
2. the numpy fallback `_py_pvs` is bit-identical to the native
   `mvn_hex_pvs` under the same budget (the docstring's claim);
3. end-to-end bit-identity: rendering a HexMemory batch through the
   bit-walk Pallas kernel (interpret mode) with the PVS `cluster_mask`
   ANDed into the survival bits produces EXACTLY the image rendered
   without it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import megaverse_tpu.constants as C
from megaverse_tpu.utils.hexmaze import HoneycombMaze
from megaverse_tpu.utils.pvs import (_py_pvs, cell_visibility,
                                     maze_portal_arrays)


def _random_maze(rng, size=None):
    size = size or int(rng.integers(2, 5))
    maze = HoneycombMaze(size, rng)
    nw = len(maze.interior_walls)
    keep = (set(map(int, rng.choice(nw, size=max(1, int(nw * 0.6)),
                                    replace=False)))
            if nw else set())
    return maze, keep


def _wall_segments(maze, keep):
    """All closed-edge segments (outer boundary + kept interior walls),
    maze units. Interior walls appear once per side — duplicates are
    harmless for distance queries."""
    neigh, open_, edge_pts = maze_portal_arrays(maze, keep)
    segs = [edge_pts[i, n]
            for i in range(neigh.shape[0]) for n in range(6)
            if not open_[i, n]]
    return np.asarray(segs).reshape(-1, 4)


def _pt_seg_dist(pts, a, b):
    """pts [K,2] vs segments a/b [W,2] -> [K,W] distances."""
    ab = b - a                                        # [W,2]
    ap = pts[:, None, :] - a[None, :, :]              # [K,W,2]
    denom = np.maximum((ab * ab).sum(-1), 1e-12)      # [W]
    t = np.clip((ap * ab[None]).sum(-1) / denom, 0.0, 1.0)
    close = a[None] + t[..., None] * ab[None]
    return np.linalg.norm(pts[:, None, :] - close, axis=-1)


def _sightline_clearance(p, q, segs):
    """Min distance from segment p-q to any wall segment (0 if any proper
    intersection)."""
    a, b = segs[:, 0:2], segs[:, 2:4]
    r = q - p
    s = b - a
    denom = r[0] * s[:, 1] - r[1] * s[:, 0]
    ap = a - p[None]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (ap[:, 0] * s[:, 1] - ap[:, 1] * s[:, 0]) / denom
        u = (ap[:, 0] * r[1] - ap[:, 1] * r[0]) / denom
    hit = (np.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    if hit.any():
        return 0.0
    d = min(
        _pt_seg_dist(np.stack([p, q]), a, b).min(),
        _pt_seg_dist(a, p[None].repeat(len(a), 0),
                     q[None].repeat(len(a), 0)).min()
        if len(a) else np.inf,
        _pt_seg_dist(b, p[None].repeat(len(b), 0),
                     q[None].repeat(len(b), 0)).min()
        if len(b) else np.inf,
    )
    return float(d)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cell_visibility_conservative(seed):
    """Any (a, b) marked invisible must have every sampled sightline
    blocked: a sightline with clear margin from all walls disproves the
    mask (conservative-culling contract)."""
    rng = np.random.default_rng(100 + seed)
    maze, keep = _random_maze(rng)
    vis = cell_visibility(maze, keep)
    segs = _wall_segments(maze, keep)
    n = len(maze.cells)
    assert vis.shape == (n, n)
    invis = np.argwhere(~vis)
    # sample points well inside each hexagon (inradius ~0.866 maze units)
    for a, b in invis[rng.permutation(len(invis))[:60]]:
        for _ in range(25):
            ang = rng.random(2) * 2 * np.pi
            rad = rng.random(2) * 0.6
            pa = maze.centers[a] + rad[0] * np.array(
                [np.cos(ang[0]), np.sin(ang[0])])
            pb = maze.centers[b] + rad[1] * np.array(
                [np.cos(ang[1]), np.sin(ang[1])])
            clearance = _sightline_clearance(pa, pb, segs)
            assert clearance <= 0.05, (
                f"cells {a}->{b} marked invisible but a sightline "
                f"{pa}->{pb} clears every wall by {clearance:.3f}")


@pytest.mark.parametrize("seed", [5, 6])
def test_cell_visibility_marks_self_and_open_neighbors(seed):
    """Reflexivity + every open portal's two cells see each other (the
    center-to-center line crosses the shared edge's interior)."""
    rng = np.random.default_rng(seed)
    maze, keep = _random_maze(rng)
    vis = cell_visibility(maze, keep)
    assert vis.diagonal().all()
    neigh, open_, _ = maze_portal_arrays(maze, keep)
    for i in range(neigh.shape[0]):
        for nn in range(6):
            j = neigh[i, nn]
            if j >= 0 and open_[i, nn]:
                assert vis[i, j] and vis[j, i], (i, j)


def test_py_pvs_matches_native():
    """The numpy fallback is bit-identical to mvn_hex_pvs under the same
    budget (claimed in utils/pvs.py docstring)."""
    from megaverse_tpu.utils import native

    if not native.have_native():
        pytest.skip("native library unavailable")
    for seed in (11, 12, 13):
        rng = np.random.default_rng(seed)
        maze, keep = _random_maze(rng)
        neigh, open_, edge_pts = maze_portal_arrays(maze, keep)
        for budget in (4000, 50):   # 50 exercises budget-exhaustion rows
            out = native.hex_pvs(neigh, open_, edge_pts, budget)
            if out is None:
                pytest.skip("mvn_hex_pvs entry point unavailable")
            py = _py_pvs(neigh, open_, edge_pts, budget)
            np.testing.assert_array_equal(
                out[0].astype(bool), py,
                err_msg=f"seed={seed} budget={budget}")


# ---------------------------------------------------------------------------
# device row-mask lookup (ops/pvs.row_mask)
# ---------------------------------------------------------------------------

def test_row_mask_sentinel_fallbacks():
    """The guard must fall back to everything-visible whenever the 2D
    reduction's premise could fail: eye at/above the wall-top plane, eye
    outside every cell, or PVS disabled (walltop <= 0)."""
    from megaverse_tpu.ops.pvs import row_mask
    from megaverse_tpu.scenarios.hex import MAZE_SCALE

    cmax, nrows = 4, 20
    centers = np.full((cmax, 2), 1e9, np.float32)
    centers[0] = (0.0, 0.0)
    centers[1] = (2 * MAZE_SCALE, 0.0)
    rows16 = np.zeros((cmax + 1, 2), np.int32)
    rows16[0, 0] = 0b101            # cell 0 sees rows {0, 2}
    rows16[1, 0] = 0b010
    rows16[cmax] = 0xFFFF           # sentinel: everything visible
    eye_off = C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y
    walltop = np.float32(2.0)

    def mask(pos_xyz, wt=walltop):
        pos = jnp.asarray([pos_xyz], jnp.float32)
        return np.asarray(row_mask(pos, jnp.asarray(centers),
                                   jnp.asarray(rows16), jnp.asarray(wt),
                                   nrows, MAZE_SCALE))[0]

    # eye inside cell 0, below walltop: cell 0's bits
    m = mask([0.0, 0.5 - eye_off, 0.0])
    assert m[0] and not m[1] and m[2] and not m[3:].any()
    # inside cell 1: cell 1's bits
    m = mask([2 * MAZE_SCALE, 0.5 - eye_off, 0.0])
    assert m[1] and not m[0]
    # eye above the wall-top plane (jump apex): sentinel
    assert mask([0.0, 3.0 - eye_off, 0.0]).all()
    # eye outside every cell: sentinel
    assert mask([50 * MAZE_SCALE, 0.5 - eye_off, 0.0]).all()
    # PVS disabled for the env: sentinel
    assert mask([0.0, 0.5 - eye_off, 0.0], wt=np.float32(-1.0)).all()


# ---------------------------------------------------------------------------
# end-to-end bit-identity through the bit-walk kernel
# ---------------------------------------------------------------------------

@pytest.mark.render_heavy
def test_pvs_cluster_mask_bit_identity():
    """Rendering with the PVS cluster_mask ANDed into the survival bits
    (exactly as env.render_batch wires it) must be BIT-IDENTICAL to
    rendering without it — and the mask must actually cull rows, so the
    equality has teeth."""
    from megaverse_tpu.ops import raycast_pallas as RP
    from megaverse_tpu.vector_env import VectorEnv

    # Find a seed whose generated envs include active PVS (omit_p <= 0.45)
    # with real culled bits. Agents spawn 1.75 above the floor and the eye
    # sits above the wall-top plane until they settle (~8 steps), during
    # which row_mask correctly falls back to the all-visible sentinel — so
    # step until settled before reading the mask.
    for seed in (3, 0, 1, 4, 6, 8):
        env = VectorEnv("HexMemory", num_envs=2, num_agents_per_env=2,
                        seed=seed, render=False)
        env.reset()
        act = np.full((2, 2), C.ACTION_FORWARD | C.ACTION_LOOK_LEFT, np.int32)
        for _ in range(12):
            env.step(act)
        row_bits = np.asarray(env.scenario.render_row_mask(env.state))
        env.close()
        if not row_bits.all():
            break
    else:
        pytest.fail("no seed produced an active PVS mask with culled rows")

    import dataclasses

    st = env.state
    # bit-identity is resolution-independent; 24 px keeps 3 tile rows at
    # 1/3 the interpret-mode cost
    cfg = dataclasses.replace(env.scenario.cfg, obs_height=24)
    remaining = jnp.maximum(
        0.0, (st.episode_len_sec - st.episode_sec) / st.episode_len_sec)
    cams = jax.vmap(lambda s, tf: RP.build_cams(cfg, s.agents, tf,
                                                s.last_reward))(st, remaining)
    prims = jax.vmap(
        lambda s: RP.build_prim_table(
            cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents,
            include_agent_rows=True)
    )(st)
    prims, clusters = jax.vmap(RP.build_clusters)(prims)
    clusters, _ = jax.vmap(RP.build_superclusters)(clusters)
    prims = jax.vmap(RP.pad_prims_to_clusters)(prims, clusters)

    # the exact alignment env.render_batch performs (no bucket): box rows
    # always visible + per-prop-row bits + padding rows visible
    bsz, na = row_bits.shape[:2]
    rb = np.concatenate(
        [np.ones((bsz, na, st.box_color.shape[1]), bool), row_bits], axis=2)
    pad = prims.shape[1] - rb.shape[2]
    assert pad >= 0
    if pad:
        rb = np.concatenate([rb, np.ones((bsz, na, pad), bool)], axis=2)
    cluster_mask = jnp.asarray(
        rb.reshape(bsz, na, -1, RP.CLUSTER_K).any(axis=3))
    assert not np.asarray(cluster_mask).all(), \
        "PVS mask culled no clusters: test has no teeth"

    h, w = cfg.obs_height, cfg.obs_width
    sc0, cl0, sd0, cd0 = RP.cull_bits(cams, clusters, h, w)
    sc1, cl1, sd1, cd1 = RP.cull_bits(cams, clusters, h, w,
                                      cluster_mask=cluster_mask)
    assert (np.asarray(cl0) != np.asarray(cl1)).any(), \
        "cluster_mask did not change the survival bits"

    img0 = np.asarray(RP.render_packed(cams, prims, h, w, clusters=clusters,
                                       scbits=sc0, clbits=cl0,
                                       scdist=sd0, cdist=cd0,
                                       interpret=True))
    img1 = np.asarray(RP.render_packed(cams, prims, h, w, clusters=clusters,
                                       scbits=sc1, clbits=cl1,
                                       scdist=sd1, cdist=cd1,
                                       interpret=True))
    np.testing.assert_array_equal(img1, img0)
