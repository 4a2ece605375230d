"""Single-environment step function assembly.

The reference's Env::step (env.cpp:83-152) — action decode, scenario preStep,
Bullet stepSimulation, scenario step, timers, reward accumulation — becomes one
pure function `env_step` over an EnvState pytree, plus a masked auto-reset that
consumes a pre-generated episode layout (replacing VectorEnv's serial reset of
done envs, vector_env.cpp:89-108). `env_step` is unbatched; the vector env
vmaps it over the environment batch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from megaverse_tpu import constants as C
from megaverse_tpu.ops import physics as P
from megaverse_tpu.ops import raycast as R
from megaverse_tpu.scenarios.base import Scenario
from megaverse_tpu.types import (
    AgentState,
    EnvState,
    PropState,
    SceneData,
    state_from_scene,
    tree_select,
)


class StepResult(NamedTuple):
    state: EnvState
    obs: jax.Array          # uint8 [A, H, W, 3]
    reward: jax.Array       # f32 [A]
    done: jax.Array         # bool scalar (pre-reset, ref bindings semantics)
    true_objective: jax.Array  # f32 [A] captured pre-reset (vector_env.cpp:96-103)


DEFERRED_RESET_FIELDS = (
    "cols", "vterrain", "vobj", "box_lo", "box_hi", "box_color", "props")


def env_step(
    scenario: Scenario,
    state: EnvState,
    next_scene: SceneData,
    action: jax.Array,     # int32 [A] bitmask
    shaping: jax.Array,    # f32 [A, K]
    render_obs: bool = True,
    defer_reset: bool = False,
) -> StepResult:
    cfg = scenario.cfg
    dt = cfg.dt
    vlimit = cfg.param(C.P_VERTICAL_LOOK_LIMIT)

    # Controls (env.cpp:89-122).
    agents = P.apply_look(state.agents, action, dt, vlimit)
    agents = P.apply_acceleration(agents, action, dt)
    state = state.replace(agents=agents)

    # Scenario preStep (env.cpp:124).
    state = scenario.pre_physics(state, action)

    # Physics (env.cpp:126: bWorld.stepSimulation -> KCC playerStep per agent).
    # The solid-column bitmask grid is the STATE's canonical collision
    # representation (packed at generation time, updated incrementally by the
    # few voxel-mutating scenarios) — the per-step full-grid pack it replaces
    # was the single largest sim-side HBM term (ObstaclesHard: 671 MB/step at
    # 1024 envs).
    cols = state.cols
    # Exact rotated-wall OBBs (hex mazes): scenario-provided, None elsewhere
    # (trace-time constant, so non-hex scenarios compile no OBB code).
    obbs = scenario.collision_obbs(state)
    agents = P.player_step(cfg.grid, None, state.agents, dt, cols=cols,
                           obbs=obbs)
    agents = P.resolve_agent_collisions(agents, cfg.grid, None, cols=cols,
                                        obbs=obbs)
    state = state.replace(agents=agents)

    # Scenario logic + rewards (env.cpp:131).
    state, reward = scenario.scen_step(state, action, shaping)

    # Timers (env.cpp:133-151). scen_step may have bumped episode_sec via
    # doneWithTimer semantics before the += dt.
    episode_sec = state.episode_sec + dt
    done = state.done | (episode_sec >= state.episode_len_sec)
    state = state.replace(
        episode_sec=episode_sec,
        done=done,
        last_reward=reward,
        total_reward=state.total_reward + reward,
        num_frames=state.num_frames + 1,
    )

    # Capture trueObjective before auto-reset (vector_env.cpp:94-103).
    true_objective = state.true_objective

    # Masked auto-reset from the pre-generated layout. With defer_reset the
    # leaves that are PURE COPIES of the layout (grids, box/prop tables) are
    # excluded from this per-env select — the batched wrapper patches them
    # afterwards with a K-slot scatter (apply_deferred_resets), so the per-
    # step HBM cost of auto-reset scales with the number of envs actually
    # done instead of streaming every env's full layout every step (the
    # dominant sim-side bandwidth term for big-grid scenarios).
    rng, sub = jax.random.split(state.rng)
    fresh = state_from_scene(next_scene, cfg.num_agents, sub)
    if defer_reset:
        fresh = fresh.replace(
            **{f: getattr(state, f) for f in DEFERRED_RESET_FIELDS})
        dsf = scenario.deferred_scen_fields
        if dsf:
            # layout-pure scen leaves (e.g. hex wall OBBs / PVS tables) are
            # deferred the same way — they can be large and never mutate
            fresh = fresh.replace(scen=fresh.scen.replace(
                **{k: getattr(state.scen, k) for k in dsf}))
    state = tree_select(done, fresh, state.replace(rng=rng))

    if render_obs:
        obs = render_state(scenario, state)
    else:
        obs = jnp.zeros((cfg.num_agents, cfg.obs_height, cfg.obs_width, 3), jnp.uint8)

    return StepResult(state, obs, reward, done, true_objective)


def should_defer_reset(scenario) -> bool:
    """Whether the K-slot deferred auto-reset pays for a scenario.

    The deferred path replaces the per-step full select of the layout-copy
    leaves with a sort + gather/scatter under a lax.cond; that bookkeeping
    only wins when those leaves are big. Estimate their per-env footprint
    from static capacities: grids dominate; below ~32 KB/env the plain
    inline select is cheaper (Empty: ~3 KB, Sokoban: ~3 KB)."""
    cfg = scenario.cfg
    x, y, z = cfg.grid.dims
    cells = x * y * z
    approx = 4 * x * (-(-y // 32)) * z            # packed cols
    if cfg.needs_terrain_grid:
        approx += cells                            # vterrain u8
    if cfg.needs_object_grid:
        approx += 2 * cells                        # vobj i16
    approx += int(scenario.max_boxes) * 28         # box_lo/hi f32 + color
    approx += int(cfg.max_props) * 44              # PropState rows
    return approx > 32 * 1024


def reset_slot_count(num_envs: int, episode_len_sec: float) -> int:
    """Slot budget for apply_deferred_resets.

    The K-slot gather/scatter reads and writes max_slots envs' full layouts
    EVERY step regardless of how many actually finished (clamped gather
    indices still move the bytes), so on big-grid scenarios (Obstacles:
    ~4 MB/env of packed cols + vterrain + vobj) oversized slots become the
    dominant sim-side HBM term — 32 slots cost ~7 ms/step on the dev chip.
    Expected resets per step are num_envs / episode_steps (~1 for 1024 envs
    at the 90 s / 15 Hz obstacles episode); 8x that covers the Poisson tail
    far past p99.99, and genuine sync bursts (first-cycle timeouts) take the
    full-select fallback branch once per cycle."""
    steps = max(1.0, float(episode_len_sec) * C.DEFAULT_FRAME_RATE)
    expected = num_envs / steps
    k = 4
    while k < 8 * expected and k < 32:
        k *= 2
    return k


def apply_deferred_resets(state, next_scenes, done, max_slots: int = 32,
                          scen_fields: tuple = ()):
    """Batched completion of env_step(defer_reset=True): copy the layout-
    copy leaves (DEFERRED_RESET_FIELDS) from next_scenes into the state for
    done envs.

    Runs OUTSIDE the vmapped step: when <= max_slots envs finished this step
    (the overwhelmingly common case at 15 Hz), a K-slot gather/scatter moves
    only those envs' layouts; episode-length sync bursts (every env done on
    the same tick) fall back to the full masked select under a real lax.cond
    branch, so their cost is paid once per episode cycle, not every step.
    Bit-identical to the inline select: the copied values are exactly
    state_from_scene's passthrough of the scene fields."""
    bsz = done.shape[0]
    n = jnp.sum(done.astype(jnp.int32))
    # ascending done indices, then `bsz` sentinels
    idx = jnp.sort(jnp.where(done, jnp.arange(bsz, dtype=jnp.int32), bsz))
    idx = idx[: min(max_slots, bsz)]
    gidx = jnp.minimum(idx, bsz - 1)          # gather-safe
    sidx = idx                                 # == bsz -> dropped by scatter

    fields = DEFERRED_RESET_FIELDS

    def apply(state, op):
        patched = {
            f: jax.tree.map(op, getattr(state, f), getattr(next_scenes, f))
            for f in fields}
        if scen_fields:
            patched["scen"] = state.scen.replace(**{
                k: jax.tree.map(op, getattr(state.scen, k),
                                getattr(next_scenes.scen, k))
                for k in scen_fields})
        return state.replace(**patched)

    def few(state):
        def patch(dst, src):
            return dst.at[sidx].set(src[gidx], mode="drop")

        return apply(state, patch)

    def full(state):
        def sel(dst, src):
            p = done.reshape((bsz,) + (1,) * (dst.ndim - 1))
            return jnp.where(p, src, dst)

        return apply(state, sel)

    return jax.lax.cond(n <= idx.shape[0], few, full, state)


def render_state(scenario: Scenario, state: EnvState) -> jax.Array:
    """Observations for ONE env (post-reset frame for done envs, matching
    vector_env.cpp:94-107 draw ordering). Uses the trace-time-unrolled XLA
    renderer — good for small scenes / single-env use; the batched product
    path is render_batch."""
    cfg = scenario.cfg
    remaining = jnp.maximum(
        0.0, (state.episode_len_sec - state.episode_sec) / state.episode_len_sec
    )
    return R.render(
        cfg,
        state.box_lo,
        state.box_hi,
        state.box_color,
        state.props,
        state.agents,
        remaining,
        last_reward=state.last_reward,
    )


def render_custom_camera(
    scenario: Scenario,
    state: EnvState,
    eye,
    yaw: float,
    pitch: float,
    width: int = 2 * C.OBS_WIDTH,
    height: int = 2 * C.OBS_HEIGHT,
) -> jax.Array:
    """Free-camera / hires render of ONE env -> uint8 [height, width, 3].

    The equivalent of the reference overview camera + hires chained renderer
    (render_utils.cpp Overview, bindings draw_overview/draw_hires,
    megaverse.cpp:154-201): same scene content, arbitrary camera and
    resolution, through the XLA table renderer.
    """
    import dataclasses

    from megaverse_tpu.ops import raycast_pallas as RP
    from megaverse_tpu.types import AgentState

    cfg = dataclasses.replace(scenario.cfg, obs_width=width, obs_height=height)
    prims = RP.build_prim_table(
        cfg, state.box_lo, state.box_hi, state.box_color, state.props, state.agents
    )
    eye = jnp.asarray(eye, jnp.float32)
    cam_agent = AgentState.create(1).replace(
        pos=(eye - jnp.asarray(
            [0.0, C.AGENT_BODY_OFFSET_Y + C.AGENT_CAMERA_OFFSET_Y, 0.0]))[None, :],
        yaw=jnp.asarray([yaw], jnp.float32),
        pitch=jnp.asarray([pitch], jnp.float32),
    )
    img = R.render_table(cfg, cam_agent, prims, jnp.asarray(1.0))
    return img[0]


def renderer_backend() -> str:
    """'pallas' (TPU product path) or 'xla' (rolled table scan, CPU/tests).

    Override with MEGAVERSE_RENDERER=pallas|xla.
    """
    import os

    env = os.environ.get("MEGAVERSE_RENDERER")
    if env:
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def pick_render_backend(scenario, min_rows: int = 24) -> str:
    """Scene-size-aware backend choice, shared by VectorEnv and the learner.

    On TPU, scenes with >= min_rows worst-case table rows use the culled
    Pallas kernel — with per-tile frustum lists + early ray termination it
    beats the unrolled XLA renderer from a few dozen rows up (measured:
    Sokoban ~113 rows 1.6x, TowerBuilding 6.4x, Rearrange 3.8x). Near-empty
    scenes (Empty/Test: a couple of floor boxes) stay on the trace-time-
    unrolled XLA renderer, which fuses into the surrounding step/rollout
    program — it rides the HBM obs-write floor with zero per-call dispatch,
    and is the only fast option inside lax.scan rollouts on dispatch-latency-
    bound dev TPUs. Elsewhere (CPU tests) the rolled XLA table scan.
    MEGAVERSE_RENDERER overrides."""
    import os

    env = os.environ.get("MEGAVERSE_RENDERER")
    if env:
        return env
    if jax.default_backend() != "tpu":
        return "xla"
    cfg = scenario.cfg
    seg_caps = ([cap for _, _, cap in cfg.prop_segments]
                if cfg.prop_segments else [int(cfg.max_props)])
    total_rows = int(scenario.max_boxes) + sum(seg_caps)
    return "pallas" if total_rows >= min_rows else "unroll"


class RenderView(NamedTuple):
    """The subset of EnvState the batched renderer reads. Extracting it lets
    callers gather ONLY these fields per render class instead of the whole
    state (voxel grids dwarf everything else)."""
    box_lo: jax.Array
    box_hi: jax.Array
    box_color: jax.Array
    props: "PropState"
    agents: "AgentState"
    episode_sec: jax.Array
    episode_len_sec: jax.Array
    last_reward: jax.Array

    def replace(self, **kw) -> "RenderView":
        return self._replace(**kw)


def render_view(states: EnvState) -> RenderView:
    return RenderView(
        box_lo=states.box_lo, box_hi=states.box_hi, box_color=states.box_color,
        props=states.props, agents=states.agents,
        episode_sec=states.episode_sec, episode_len_sec=states.episode_len_sec,
        last_reward=states.last_reward,
    )


def render_batch(scenario: Scenario, states, backend: str | None = None,
                 fmt: str = "rgb", bucket: "tuple[int, int] | None" = None) -> jax.Array:
    """Observations for a BATCH of envs.

    fmt="rgb": uint8 [B, A, H, W, 3]. fmt="packed": int32 [B, A, H, W] with
    RGB in the low 24 bits — the canonical on-device format. A TPU array whose
    minor dimension is 3 tiles to 128 lanes (a 42x physical blowup: a 113 MB
    frame batch occupies 4.8 GB of HBM), so packed obs must be used whenever
    observations stay on device.

    The whole env x agent camera batch renders in one launch — the analogue of
    the reference's single batched Vulkan submission for all envs
    (v4r_env_renderer.cpp:338-355).

    bucket=(max_boxes, max_props): statically slice the per-env box/prop
    tables to the actual batch usage before intersecting. Scenario capacities
    are worst-case (Collect: 768 box slots vs ~32 typical), and the raycaster's
    cost is O(table rows x pixels), so rendering only the live prefix is the
    single biggest throughput lever for layout-heavy scenes. Correct because
    generation packs live rows first and padding rows are never activated at
    runtime (pos/scale/flags mutate; type never does). The analogue of the
    reference drawing only instances the scene graph actually contains.
    """
    from megaverse_tpu.ops import raycast_pallas as RP

    cfg = scenario.cfg
    backend = backend or renderer_backend()
    segments = cfg.prop_segments
    # (ptype, full-capacity start, kept-count) slices applied to the prop
    # tables below; also applied to the scenario's per-row PVS bits so their
    # row indexing tracks the bucketed table.
    row_mask_keep = None
    if bucket is not None:
        mb = max(1, min(int(bucket[0]), states.box_color.shape[1]))
        pb = bucket[1]
        if segments:
            # Per-segment live-prefix slicing: each typed region keeps only
            # its bucketed prefix, and the layout is rebuilt with the new
            # (compacted) starts.
            counts = [min(int(k), cap) for k, (_, _, cap) in zip(pb, segments)]
            keep = [(ptype, start, k)
                    for (ptype, start, cap), k in zip(segments, counts) if k]
            row_mask_keep = keep
            if keep:
                def slice_props(x):
                    return jnp.concatenate(
                        [x[:, s:s + k] for _, s, k in keep], axis=1)
                props = jax.tree.map(slice_props, states.props)
            else:
                props = jax.tree.map(lambda x: x[:, :0], states.props)
            new_layout, cursor = [], 0
            for ptype, _, k in keep:
                new_layout.append((ptype, cursor, k))
                cursor += k
            segments = tuple(new_layout)
            states = states.replace(
                box_lo=states.box_lo[:, :mb],
                box_hi=states.box_hi[:, :mb],
                box_color=states.box_color[:, :mb],
                props=props,
            )
        else:
            # pb == 0 is allowed: a scenario whose layouts never contain
            # props (Empty) renders zero prop rows.
            pb = max(0, min(int(pb), states.props.type.shape[1]))
            row_mask_keep = [(None, 0, pb)] if pb else []
            states = states.replace(
                box_lo=states.box_lo[:, :mb],
                box_hi=states.box_hi[:, :mb],
                box_color=states.box_color[:, :mb],
                props=jax.tree.map(lambda x: x[:, :pb], states.props),
            )
    remaining = jnp.maximum(
        0.0, (states.episode_len_sec - states.episode_sec) / states.episode_len_sec
    )  # [B]
    # Single-agent first-person views can never see the own body/eyes (camera
    # inside, inside hits culled) — drop those rows from the table.
    include_agents = cfg.num_agents > 1

    def make_prims(states):
        return jax.vmap(
            lambda s: RP.build_prim_table(
                cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents,
                include_agent_rows=include_agents,
            )
        )(states)

    ui_ind = float(cfg.params.get(C.P_USE_UI_REWARD_INDICATORS, 0.0)) > 0
    if backend == "pallas":
        import os

        cams = jax.vmap(
            lambda s, tf: RP.build_cams(cfg, s.agents, tf, s.last_reward)
        )(states, remaining)
        prims = make_prims(states)
        clusters = order = dist = sclusters = scbits = clbits = None
        scdist = cdist = None
        mode = os.environ.get("MEGAVERSE_RENDER_MODE", "bits")
        if mode == "bits" and not os.environ.get("MEGAVERSE_NO_CLUSTER_CULL"):
            # Default: bit-walk traversal. The prologue is pure elementwise
            # XLA (no sort); the kernel's control flow is scalar-only. See
            # RP.cull_bits for the measured rationale.
            prims, clusters = jax.vmap(RP.build_clusters)(prims)
            clusters, _ = jax.vmap(RP.build_superclusters)(clusters)
            prims = jax.vmap(
                lambda p, c: RP.pad_prims_to_clusters(p, c),
                in_axes=(0, 0))(prims, clusters)
            cluster_mask = None
            if not os.environ.get("MEGAVERSE_NO_PVS"):
                row_bits = scenario.render_row_mask(states)
                if row_bits is not None:
                    # align the full-capacity per-prop-row bits with the
                    # prim table: boxes prefix (always visible) + the same
                    # per-segment slices the prop tables got + agent rows +
                    # cluster padding (padding clusters are dead anyway),
                    # then reduce to per-cluster bits
                    bsz, na = row_bits.shape[:2]
                    parts = [jnp.ones(
                        (bsz, na, states.box_color.shape[1]), bool)]
                    if row_mask_keep is None:
                        parts.append(row_bits)
                    else:
                        parts += [row_bits[:, :, s:s + k]
                                  for _, s, k in row_mask_keep]
                    rb = jnp.concatenate(parts, axis=2)
                    pad = prims.shape[1] - rb.shape[2]
                    if pad > 0:
                        rb = jnp.concatenate(
                            [rb, jnp.ones((bsz, na, pad), bool)], axis=2)
                    cluster_mask = rb.reshape(
                        bsz, na, -1, RP.CLUSTER_K).any(axis=3)
            scbits, clbits, scdist, cdist = RP.cull_bits(
                cams, clusters, cfg.obs_height, cfg.obs_width,
                cluster_mask=cluster_mask)
        elif not os.environ.get("MEGAVERSE_NO_CLUSTER_CULL"):
            prims, clusters = jax.vmap(RP.build_clusters)(prims)
            if not os.environ.get("MEGAVERSE_NO_CLUSTER_SORT"):
                if (os.environ.get("MEGAVERSE_NO_TILE_CULL")
                        or os.environ.get("MEGAVERSE_NO_EARLY_EXIT")):
                    # per-agent front-to-back order (per-tile lists require
                    # the early-exit distance bounds)
                    order, dist = RP.sort_clusters(cams, clusters)
                    if os.environ.get("MEGAVERSE_NO_EARLY_EXIT"):
                        dist = None
                elif (os.environ.get("MEGAVERSE_NO_SUPERCLUSTERS")
                      or clusters.shape[1] < 2 * RP.SUPER_K):
                    # per-tile frustum-culled front-to-back cluster lists:
                    # the kernel loop only ever visits clusters that can
                    # affect its 8x128 pixel tile
                    order, dist = RP.frustum_cull(
                        cams, clusters, cfg.obs_height, cfg.obs_width)
                else:
                    # two-level: per-tile lists over SUPERclusters — the
                    # sorted lists (and the superlinear XLA sort feeding
                    # them) shrink by SUPER_K; the kernel prunes
                    # SUPER_K*CLUSTER_K rows per vector test
                    clusters, sclusters = jax.vmap(RP.build_superclusters)(
                        clusters)
                    order, dist = RP.frustum_cull(
                        cams, sclusters, cfg.obs_height, cfg.obs_width)
        packed = RP.render_packed(cams, prims, cfg.obs_height, cfg.obs_width,
                                  clusters=clusters, order=order, dist=dist,
                                  ui_indicators=ui_ind, sclusters=sclusters,
                                  scbits=scbits, clbits=clbits,
                                  scdist=scdist, cdist=cdist,
                                  merge_tiles=bool(
                                      os.environ.get("MEGAVERSE_MERGE_TILES")))
    elif backend == "unroll":
        # Trace-time-unrolled XLA renderer: fastest for small scenes; compile
        # time grows with primitive count (use for benchmark scenarios).
        packed = jax.vmap(
            lambda s, tf: R.render_packed(cfg, s.box_lo, s.box_hi, s.box_color,
                                          s.props, s.agents, tf,
                                          segments=segments,
                                          last_reward=s.last_reward)
        )(states, remaining)
    else:
        # XLA fallback: rolled scan over the same table.
        def one(s, prim, tf):
            return R.render_table_packed(cfg, s.agents, prim, tf,
                                         last_reward=s.last_reward)

        packed = jax.vmap(one)(states, make_prims(states), remaining)
    if fmt == "packed":
        return packed
    return RP.unpack_rgb(packed)
