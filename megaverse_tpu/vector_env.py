"""Vectorized environment: vmapped step + device-side auto-reset buffer.

TPU-native replacement for the reference VectorEnv thread pool
(env/src/vector_env.cpp:6-127): instead of N CPU threads stepping N envs behind
a spin barrier, the whole batch steps in lockstep inside one jitted vmapped
function, and observations for all env×agent cameras come out of one batched
render (the analogue of the single v4r cmdStream.render, v4r_env_renderer.cpp:338-355).

Auto-reset: the jitted step consumes a per-env "next episode layout" buffer by
masked gather when an env finishes (replacing the serial reset of done envs,
vector_env.cpp:89-108). The host refills consumed slots from numpy procedural
generation between steps; each env's layout stream is keyed by its own seed
chain (mirroring megaverse.cpp:60-69 master->per-env seeding), so results are
deterministic regardless of refill timing.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from megaverse_tpu import constants as C
from megaverse_tpu.env import env_step, render_batch
from megaverse_tpu.scenarios import make_scenario
from megaverse_tpu.scenarios.base import Scenario
from megaverse_tpu.types import (
    EnvState,
    SceneData,
    multidiscrete_to_bitmask,
    state_from_scene,
)

# How many steps may elapse between done-flag inspections on the host. Must be
# much smaller than the shortest episode (>= 6 s = 90 steps) so a slot is never
# consumed twice before refill.
DONE_POLL_INTERVAL = 16


def refill_slot_rung(n: int, num_envs: int) -> int:
    """Padded slot count for a refill of `n` envs: 1.5x rungs
    (64/96/128/192/...) instead of pure doubling — short-episode scenarios
    sit just past a power of two (ObstaclesEasy: ~65 resets per 64-step
    chunk at 1024 envs) and the padded rows are real upload bytes
    (docs/obstacles_easy_vs_hard.md)."""
    slots = 64
    for rung in (64, 96, 128, 192, 256, 384, 512, 768, 1024):
        slots = rung
        if rung >= n:
            break
    while slots < n:  # num_envs can exceed the ladder tail
        slots *= 2
    return min(slots, num_envs)


class VectorEnv:
    """Batched auto-resetting environment."""

    def __init__(
        self,
        scenario_name: str,
        num_envs: int,
        num_agents_per_env: int = 1,
        params: Optional[Dict[str, float]] = None,
        seed: int = 42,
        render: bool = True,
        obs_format: str = "auto",
        device=None,
        rng_mode: str = "numpy",
    ):
        self.scenario: Scenario = make_scenario(
            scenario_name, num_agents=num_agents_per_env, params=params
        )
        self.num_envs = num_envs
        self.num_agents_per_env = num_agents_per_env
        self.render_obs = render
        # "packed" int32 [B,A,H,W] is the canonical on-device obs format: a
        # TPU u8 array with minor dim 3 pads 3 -> 128 lanes (42x HBM blowup).
        if obs_format == "auto":
            obs_format = "packed" if jax.default_backend() == "tpu" else "rgb"
        self.obs_format = obs_format
        # `device` may be a jax.Device OR a jax.sharding.Sharding. Passing a
        # NamedSharding over the env-batch axis shards every [B, ...] buffer
        # (state, layout buffer, actions, shaping) across the mesh; the jitted
        # vmapped step is embarrassingly parallel over B, so XLA SPMD runs each
        # shard on its own chip with no collectives — the TPU-native analogue
        # of the reference's one-Sample-Factory-worker-per-GPU scale-out.
        self.device = device

        # rng_mode="reference": layouts draw from bit-exact libstdc++
        # mt19937 streams through the reference's master->env->episode seed
        # chain (utils/refrng.py; megaverse.cpp:60-69, env.cpp:61-63), so
        # generated geometry matches the C++ engine's under the same seed.
        # Only scenarios with supports_ref_stream implement it.
        if rng_mode not in ("numpy", "reference"):
            raise ValueError(f"unknown rng_mode {rng_mode!r}")
        if rng_mode == "reference" and not self.scenario.supports_ref_stream:
            raise ValueError(
                f"{self.scenario.name}: reference-stream generation not "
                "implemented (supports_ref_stream=False); see PARITY.md")
        self.rng_mode = rng_mode
        self._gens: List = []
        self._master_seed = seed
        self.seed(seed)

        self.shaping = self._put(
            np.tile(self.scenario.shaping_array()[None], (num_envs, 1, 1))
        )

        scen = self.scenario
        from megaverse_tpu.env import (apply_deferred_resets,
                                       reset_slot_count, should_defer_reset)

        defer = should_defer_reset(scen)
        slots = reset_slot_count(
            num_envs,
            float(scen.cfg.params.get(C.P_EPISODE_LENGTH_SEC, 60.0)))

        def _step(state, next_scene, action, shaping):
            return env_step(scen, state, next_scene, action, shaping,
                            render_obs=False, defer_reset=defer)

        _vstep_mapped = jax.vmap(_step, in_axes=(0, 0, 0, 0))

        if defer:
            def _vstep_inner(state, next_scenes, action, shaping):
                res = _vstep_mapped(state, next_scenes, action, shaping)
                # K-slot batched completion of the masked auto-reset (the
                # layout-copy leaves were excluded from the per-env select;
                # see env.py).
                return res._replace(state=apply_deferred_resets(
                    res.state, next_scenes, res.done, max_slots=slots,
                    scen_fields=scen.deferred_scen_fields))

            self._vstep_inner = _vstep_inner
        else:
            self._vstep_inner = _vstep_mapped

        # Render-table bucket: (max live boxes, max live props) across the
        # batch, tracked as a high-water mark over every layout generated so
        # far. Scenario capacities are worst-case (Collect: 768 box slots vs
        # ~32 live); raycast cost is O(rows x pixels), so rendering only the
        # live prefix is the main throughput lever for layout-heavy scenes.
        # Growing the bucket costs a render recompile (rare: high-water
        # + 25% headroom, rounded up).
        self._bucket: Optional[tuple] = None
        self._hw_boxes = 0
        segs = self.scenario.cfg.prop_segments
        self._hw_props = [0] * len(segs) if segs else 0
        self._backend = self._pick_backend()
        self._init_render_classes()
        self._build_render_fns()

        # Split dispatches: the sim step is a pure-XLA dependent chain (fast to
        # pipeline), while render dispatches depend only on their state
        # snapshot and are mutually independent — they overlap even when a
        # Pallas call has high per-execution latency (tunneled dev TPUs).
        # NO donation here: on the split-dispatch path the render program
        # reads the state this program produced; donating would alias the
        # next sim step's output onto the buffer the in-flight render is
        # still reading, forcing the runtime to serialize them — measured
        # 14.8k -> 9.8k obs/s on HexMemory. Donation lives only on the
        # fused/scan programs, where no other program reads the state.
        self._vstep_sim = jax.jit(self._vstep_inner,
                                  out_shardings=self._out_shard())
        self._vinit = jax.jit(
            jax.vmap(lambda sc, key: state_from_scene(sc, num_agents_per_env, key)),
            out_shardings=self._out_shard(),
        )

        # Per-step dispatch shape for the pallas backend on the Python-loop
        # path (tunneled dev TPU): "split" issues sim and render as separate
        # jitted dispatches (they overlap on the tunnel — render executes
        # while the next sim's dispatch is in flight), "fused" issues one
        # combined program per step (saves ~2 Python dispatches/step, which
        # dominates when device work is light). Neither wins universally
        # (measured: Sokoban fused 123k vs split 111k obs/s; TowerBuilding
        # split 91k vs fused 60k), so step_many times one warmup chunk each
        # way and locks in the winner. MEGAVERSE_DISPATCH=split|fused
        # overrides.
        self._dmode: Optional[str] = None
        self._dmode_trials: list = []

        self.state: Optional[EnvState] = None
        self.next_scenes: Optional[SceneData] = None
        self._steps_since_poll = 0
        # Running OR of done flags since the last refill: a single fixed-shape
        # device op per step (a growing jnp.stack would be a fresh program --
        # and a fresh multi-minute remote compile -- per distinct length).
        self._pending_dones: Optional[jax.Array] = None

    def _put(self, x):
        """Ship to the configured device/sharding (batch-dim leading)."""
        if self.device is not None:
            return jax.device_put(x, self.device)
        return jnp.asarray(x)

    def _donate_state(self):
        """donate_argnums for the EnvState arg (MEGAVERSE_NO_DONATE=1 keeps
        the copy-on-step behavior for A/B measurement)."""
        import os

        return () if os.environ.get("MEGAVERSE_NO_DONATE") else (0,)

    def _out_shard(self):
        """Explicit out_shardings for jitted step/render programs when the env
        batch is sharded. Without this, GSPMD picks output layouts from
        propagation alone, which was observed to collapse every [B, ...]
        output onto one device run-to-run (MULTICHIP_r04 flake) when some
        inputs (PRNG keys, freshly-generated layouts) were uncommitted.
        Pinning the leading env axis makes placement deterministic: every
        output leaf is [B, ...] over the batch."""
        from jax.sharding import Sharding

        return self.device if isinstance(self.device, Sharding) else None

    # ------------------------------------------------------------- dispatch
    # Trial schedule: 3 timed chunks per mode, interleaved so state-evolution
    # drift (later chunks run on heavier, more evolved states) cancels
    # between the modes instead of biasing one. The decision takes the
    # MEDIAN per mode: a single chunk hitting a refill stall or tunnel
    # hiccup mispicked the production mode in round 4 (TowerBuilding locked
    # fused at 71k when split sustains 91k).
    _DMODE_SCHEDULE = ("split", "fused", "fused", "split", "split", "fused")

    def _dispatch_mode(self) -> str:
        """Current (or next-trial) dispatch shape for the pallas loop path."""
        import os

        if self._dmode is not None:
            return self._dmode
        forced = os.environ.get("MEGAVERSE_DISPATCH")
        if forced in ("split", "fused"):
            self._dmode = forced
            return forced
        from megaverse_tpu.utils.platform import is_tunneled_tpu

        if not is_tunneled_tpu():
            # real TPUs take the scan path; CPU tests keep the historical
            # split default
            self._dmode = "split"
            return "split"
        n = len(self._dmode_trials)
        return self._DMODE_SCHEDULE[min(n, len(self._DMODE_SCHEDULE) - 1)]

    def dispatch_trials_done(self) -> bool:
        """True once the dispatch mode is locked (benchmarks keep warming up
        until this holds so no trial chunk lands in a timed section)."""
        return (self._dmode is not None
                or self._use_scan_steps()
                or self._backend != "pallas" or self._use_classes)

    def _use_scan_steps(self) -> bool:
        import os

        scan_env = os.environ.get("MEGAVERSE_SCAN_STEPS")
        if scan_env is not None:
            return scan_env == "1"
        from megaverse_tpu.utils.platform import is_tunneled_tpu

        # CPU stays on the loop path too: tests exercise both, and scan
        # compile times on 2-core hosts dwarf any dispatch savings.
        return jax.default_backend() == "tpu" and not is_tunneled_tpu()

    def _note_dispatch_trial(self, mode: str, ms_per_step: float) -> None:
        if self._dmode is not None:
            return
        self._dmode_trials.append((mode, ms_per_step))
        if len(self._dmode_trials) >= len(self._DMODE_SCHEDULE):
            import statistics

            from megaverse_tpu.utils.logging import log

            med = {
                m: statistics.median(
                    t for mm, t in self._dmode_trials if mm == m)
                for m in ("split", "fused")
            }
            # Near-ties go to split (the historical default): trial chunks
            # carry a few % of noise even as medians, and a mispicked mode
            # costs the whole run (Rearrange r5: fused "won" by 0.7% in
            # trials, then timed 4% slower). fused must win by >3% to
            # displace split.
            self._dmode = ("fused" if med["fused"] < 0.97 * med["split"]
                           else "split")
            log().info(
                "dispatch trial %s: split %.2f ms fused %.2f ms -> %s",
                self.scenario.name, med["split"], med["fused"], self._dmode)

    # ---------------------------------------------------------------- renderer
    def _pick_backend(self) -> str:
        """Renderer backend for this env's scenario (see
        env.pick_render_backend: culled Pallas from a few dozen rows up,
        fused unroll for near-empty scenes, MEGAVERSE_RENDERER override)."""
        from megaverse_tpu.env import pick_render_backend

        return pick_render_backend(self.scenario)

    def _build_render_fns(self) -> None:
        """(Re)jit every render-dependent program for the current bucket."""
        scen, fmt, bucket = self.scenario, self.obs_format, self._bucket
        do_render = self.render_obs
        backend = self._backend

        def _render(s):
            return render_batch(scen, s, fmt=fmt, bucket=bucket, backend=backend)

        def _step_render(state, next_scenes, action, shaping):
            res = self._vstep_inner(state, next_scenes, action, shaping)
            obs = _render(res.state) if do_render else res.obs
            return res._replace(obs=obs)

        self._step_render = _step_render
        # donate_argnums=(0,): the previous EnvState is dead after every
        # step (self.state is replaced by the result), and donating it lets
        # XLA update the big voxel-grid leaves in place instead of copying
        # the whole state through HBM each step — the sim path is
        # state-traffic-bound, not flop-bound.
        self._vstep = jax.jit(_step_render, out_shardings=self._out_shard(),
                              donate_argnums=self._donate_state())
        self._vrender = jax.jit(_render, out_shardings=self._out_shard())
        self._vrender_sum = jax.jit(
            lambda s: (lambda o: (o, jnp.sum(o, dtype=jnp.int32)))(_render(s)))
        for attr in ("_chunk_fused", "_scan_fns"):
            if hasattr(self, attr):
                delattr(self, attr)

    # -------------------------------------------------- render size classes
    # One outlier layout must not set the whole batch's table size: the
    # renderer's cost is O(table rows x pixels) and row counts are heavy-
    # tailed (Collect: p50=44 merged boxes, max ~550). Envs are partitioned
    # by their CURRENT layout's live row counts into a few static bucket
    # classes; each class renders through its own gather->render program and
    # the frames are reassembled by one inverse-permutation gather. Class
    # membership is host bookkeeping, exact and conservative: an env's rows
    # are max(current episode, buffered next layout), covering auto-resets
    # that consume the buffer between refill polls.
    _CLASS_MIN_ROWS = 256       # only partition genuinely large scenarios
    _NUM_CLASSES = 6

    def _init_render_classes(self) -> None:
        cfg = self.scenario.cfg
        box_cap = int(self.scenario.max_boxes)
        seg_caps = [cap for _, _, cap in cfg.prop_segments]
        if not cfg.prop_segments:
            seg_caps = [int(cfg.max_props)]
        dims = [box_cap] + seg_caps
        import os

        # Size-class rendering is OFF by default on TPU: each refill reshuffles
        # class-group sizes, and every novel (class, padded-size) combination
        # is a fresh compile — measured as 100+ ms/step of compile stalls in
        # sustained sampling (vs <40 ms/step of device work). The bit-walk
        # kernel removed the padding cost classes existed to avoid (a padded
        # row is a culled bit, not per-pixel work), so the flat bucketed path
        # wins outright. MEGAVERSE_CLASSES=1 re-enables for comparison; the
        # class machinery stays exercised by tests on CPU.
        want_classes = (os.environ.get("MEGAVERSE_CLASSES") == "1"
                        or (jax.default_backend() != "tpu"
                            and not os.environ.get("MEGAVERSE_NO_CLASSES")))
        self._use_classes = (
            self.device is None
            and self.render_obs
            and want_classes
            and sum(dims) >= self._CLASS_MIN_ROWS
            and self.num_envs >= 64
        )
        if not self._use_classes:
            return
        K = self._NUM_CLASSES
        roundup = lambda n, q: ((max(int(n), 1) + q - 1) // q) * q

        def levels(cap):
            # Geometric ladder (ratio 1.6 beats powers of two: padding an env
            # one class up costs ratio-1 extra work). Small tables are cheap —
            # levelling them would drag envs into expensive classes over a
            # handful of rows, so every level gets at least min(cap, 48) rows.
            out = []
            for k in range(K):
                frac = max(cap / (1.6 ** (K - 1 - k)), min(cap, 48))
                out.append(min(cap, roundup(frac, 8)))
            return out

        # ladder[k] = (box_rows, (seg rows...)) — static, compiled lazily.
        box_lv = levels(box_cap)
        seg_lv = [levels(c) for c in seg_caps]
        self._class_ladder = [
            (box_lv[k], tuple(lv[k] for lv in seg_lv)) for k in range(K)
        ]
        self._cls_rows_cur: Optional[np.ndarray] = None  # [B, D]
        self._cls_rows_buf: Optional[np.ndarray] = None
        self._cls_groups: list = []     # [(class_k, padded_idx np.ndarray)]
        self._cls_inv = None            # device inverse permutation [B]
        self._cls_render_fns: Dict = {}
        self._cls_assemble_fns: Dict = {}

    def _scene_rows(self, scene) -> np.ndarray:
        """Live render-row counts [1 + num_segments] of one layout."""
        import megaverse_tpu.constants as _C

        cfg = self.scenario.cfg
        types = np.asarray(scene.props.type)
        rows = [int((np.asarray(scene.box_color) > 0).sum())]
        if cfg.prop_segments:
            for ptype, start, cap in cfg.prop_segments:
                rows.append(int((types[start:start + cap] != _C.PROP_NONE).sum()))
        else:
            rows.append(int((types != _C.PROP_NONE).sum()))
        return np.asarray(rows, np.int32)

    def _class_of(self, rows: np.ndarray) -> np.ndarray:
        """Smallest ladder class covering each env's rows. rows [B, D]."""
        B = rows.shape[0]
        cls = np.full((B,), len(self._class_ladder) - 1, np.int32)
        for k in reversed(range(len(self._class_ladder) - 1)):
            mb, pb = self._class_ladder[k]
            lim = np.asarray([mb, *pb], np.int32)
            fits = (rows <= lim[None, :]).all(axis=1)
            cls = np.where(fits, k, cls)
        return cls

    def _rebuild_class_groups(self) -> None:
        rows = np.maximum(self._cls_rows_cur, self._cls_rows_buf)
        cls = self._class_of(rows)
        B = self.num_envs
        # Group padding: small powers of two, then multiples of 128 — padded
        # dummies render at the group's full bucket cost, so granularity
        # matters much more than program count (compiled lazily, cached).
        pad_sizes = sorted({32, 64, *range(128, B + 1, 128), B})
        groups = []
        order_parts = []
        for k in range(len(self._class_ladder)):
            idx = np.nonzero(cls == k)[0].astype(np.int32)
            if idx.size == 0:
                continue
            padded = next(p for p in pad_sizes if p >= idx.size)
            full = np.full((padded,), idx[0], np.int32)
            full[: idx.size] = idx
            groups.append((k, jnp.asarray(full)))
            order_parts.append(full)
        order = np.concatenate(order_parts)
        # inverse permutation: first occurrence of each env in the concat
        inv = np.zeros((B,), np.int32)
        seen = np.zeros((B,), bool)
        for pos, e in enumerate(order):
            if not seen[e]:
                inv[e] = pos
                seen[e] = True
        self._cls_groups = groups
        self._cls_inv = jnp.asarray(inv)
        self._cls_total = int(order.size)

    def _render_classes(self, state) -> jax.Array:
        """Per-class gather->render, then one inverse-permutation gather."""
        from megaverse_tpu.env import render_batch, render_view

        scen, fmt = self.scenario, self.obs_format
        view = render_view(state)
        parts = []
        for k, idx in self._cls_groups:
            key = (k, int(idx.shape[0]))
            if key not in self._cls_render_fns:
                bucket = self._class_ladder[k]
                if not scen.cfg.prop_segments:
                    bucket = (bucket[0], bucket[1][0])

                def f(view, idx, _bucket=bucket):
                    sub = jax.tree.map(lambda x: x[idx], view)
                    return render_batch(scen, sub, fmt=fmt, bucket=_bucket,
                                        backend=self._backend)

                self._cls_render_fns[key] = jax.jit(f)
            parts.append(self._cls_render_fns[key](view, idx))
        akey = tuple(int(p.shape[0]) for p in parts)
        if akey not in self._cls_assemble_fns:
            self._cls_assemble_fns[akey] = jax.jit(
                lambda parts, inv: jnp.concatenate(parts, axis=0)[inv])
        return self._cls_assemble_fns[akey](parts, self._cls_inv)

    def _note_layout_counts(self, scenes) -> None:
        import megaverse_tpu.constants as _C

        segments = self.scenario.cfg.prop_segments
        for sc in scenes:
            self._hw_boxes = max(
                self._hw_boxes, int((np.asarray(sc.box_color) > 0).sum()))
            types = np.asarray(sc.props.type)
            if segments:
                for i, (ptype, start, cap) in enumerate(segments):
                    n = int((types[start:start + cap] != _C.PROP_NONE).sum())
                    self._hw_props[i] = max(self._hw_props[i], n)
            else:
                self._hw_props = max(
                    self._hw_props, int((types != _C.PROP_NONE).sum()))

    def _update_bucket(self) -> None:
        import os

        if os.environ.get("MEGAVERSE_NO_BUCKET"):
            if self._bucket is not None:
                self._bucket = None
                self._build_render_fns()
            return
        # render_batch clips the bucket to the table capacities. Bucket sizes
        # live on a coarse GEOMETRIC ladder with generous headroom: reset
        # samples 2*B layouts, so the observed high-water estimates p100 well
        # and later creep almost never crosses the next rung. This matters
        # because every distinct bucket is a distinct compiled program: the
        # round-2 fine-grained high-water creep caused mid-benchmark compile
        # storms that dominated heavy-scene wall time (measured: ObstaclesEasy
        # 198 ms/step of compile stalls on 38 ms/step of device work). With
        # the bit-walk kernel, padded rows cost ~nothing in the kernel (dead
        # clusters cull to zero bits), so coarse padding is cheap.
        def quantize(n):
            n = int(n)
            if n <= 0:
                return 0
            if n <= 8:
                # tiny tables: fine quantum (only 4 possible shapes, so no
                # churn risk) — every padded row is pure per-pixel cost for
                # the unroll renderer (Empty: 2 live rows, not 8)
                return n + (n & 1)
            v = 8
            while v < n:
                v = (v * 3 + 1) // 2  # ratio 1.5 ladder: 8,12,18,27,...
            return v

        mb = max(1, quantize(self._hw_boxes * 1.25))
        if isinstance(self._hw_props, list):
            pb = tuple(quantize(n * 1.25) for n in self._hw_props)
            grew = (self._bucket is None or mb > self._bucket[0]
                    or any(a > b for a, b in zip(pb, self._bucket[1])))
        else:
            pb = quantize(self._hw_props * 1.25)
            grew = (self._bucket is None or mb > self._bucket[0]
                    or pb > self._bucket[1])
        if grew:
            self._bucket = (mb, pb)
            self._build_render_fns()

    # ------------------------------------------------------------------ seeds
    def seed(self, seed: int) -> None:
        """Master seed fans out per-env generation streams (megaverse.cpp:60-69)."""
        self._master_seed = seed
        # Drain the prefetch worker BEFORE swapping generators: a pending task
        # resolves self._gens[i] at run time and must not touch the new streams.
        self._reset_prefetch()
        if getattr(self, "rng_mode", "numpy") == "reference":
            from megaverse_tpu.utils.refrng import Rng, fan_out_env_seeds

            self._gens = [Rng(s) for s in fan_out_env_seeds(seed, self.num_envs)]
        else:
            ss = np.random.SeedSequence(seed)
            self._gens = [np.random.Generator(np.random.PCG64(s))
                          for s in ss.spawn(self.num_envs)]

    # --------------------------------------------------------------- prefetch
    # Layout generation is host-side numpy; at high throughput the synchronous
    # refill serializes it between device chunks. A small worker pool
    # pre-generates each env's NEXT layouts while the device runs. Determinism
    # does not depend on scheduling: each env owns its generator stream, and at
    # most one task per env is ever in flight (_pop_scene resolves the queued
    # future before submitting the next), so every env's layouts are produced
    # in consumption order — bit-identical to synchronous generation. The
    # heaviest scenario generates ~110 layouts/s/thread (ObstaclesHard), i.e.
    # ~130k env-steps/s sustained per thread; the pool keeps multi-chip
    # sampling ahead of that.
    def _reset_prefetch(self) -> None:
        import os
        from collections import deque

        if getattr(self, "_prefetch_pool", None) is not None:
            self._prefetch_pool.shutdown(wait=True, cancel_futures=True)
        self._prefetch_pool = None
        self._prefetch_q = None
        if os.environ.get("MEGAVERSE_NO_PREFETCH"):
            return
        from concurrent.futures import ThreadPoolExecutor

        workers = int(os.environ.get(
            "MEGAVERSE_GEN_THREADS", min(4, os.cpu_count() or 1)))
        self._prefetch_pool = ThreadPoolExecutor(
            workers, thread_name_prefix="megaverse-gen")
        self._prefetch_q = [deque() for _ in range(self.num_envs)]

    def _gen_scene(self, i: int):
        if self.rng_mode == "reference":
            from megaverse_tpu.utils.refrng import episode_reseed

            # per-episode reseed (env.cpp:61-63) then reference-order draws
            episode_reseed(self._gens[i])
            return self.scenario.generate_checked(self._gens[i], ref_stream=True)
        return self.scenario.generate_checked(self._gens[i])

    def _pop_scene(self, i: int):
        """Next layout for env i: prefetched if available, inline otherwise.
        Tops the env's queue back up afterwards."""
        if self._prefetch_pool is None:
            return self._gen_scene(i)
        q = self._prefetch_q[i]
        fut = q.popleft() if q else self._prefetch_pool.submit(self._gen_scene, i)
        scene = fut.result()
        q.append(self._prefetch_pool.submit(self._gen_scene, i))
        return scene

    def close(self) -> None:
        if getattr(self, "_prefetch_pool", None) is not None:
            self._prefetch_pool.shutdown(wait=False, cancel_futures=True)
            self._prefetch_pool = None

    # ------------------------------------------------------------------ reset
    def _generate_batch(self, env_indices, pad_to: int = 0) -> SceneData:
        """Generate + stack layouts for env_indices; `pad_to` repeats the
        first layout host-side up to a fixed row count so every refill
        shares one device shape (shape-varying uploads/scatters compile a
        fresh program per distinct count — seconds each through a remote
        tunnel)."""
        scenes = [self._pop_scene(i) for i in env_indices]
        self._note_layout_counts(scenes)
        if self._use_classes:
            self._last_gen_rows = np.stack([self._scene_rows(s) for s in scenes])
        if pad_to > len(scenes):
            pad = pad_to - len(scenes)
            return jax.tree.map(
                lambda *xs: jnp.asarray(np.concatenate(
                    [np.stack([np.asarray(x) for x in xs]),
                     np.repeat(np.asarray(xs[0])[None], pad, axis=0)])),
                *scenes)
        # Stack on the HOST and ship one buffer per leaf: per-env device_puts
        # are catastrophically slow through the dev-TPU tunnel.
        return jax.tree.map(
            lambda *xs: jnp.asarray(np.stack([np.asarray(x) for x in xs])), *scenes)

    def reset(self) -> jax.Array:
        all_idx = range(self.num_envs)
        first = self._generate_batch(all_idx)
        if self._use_classes:
            self._cls_rows_cur = self._last_gen_rows
        self.next_scenes = jax.device_put(self._generate_batch(all_idx), self.device)
        if self._use_classes:
            self._cls_rows_buf = self._last_gen_rows
            self._rebuild_class_groups()
        keys = jax.random.split(jax.random.PRNGKey(self._master_seed), self.num_envs)
        self.state = self._vinit(jax.device_put(first, self.device),
                                 self._put(keys))
        self._steps_since_poll = 0
        self._pending_dones = None
        self._deferred_refill = None
        self._update_bucket()
        if self._use_classes:
            return self._render_classes(self.state)
        return self._vrender(self.state)

    # ------------------------------------------------------------------- step
    def step(self, actions):
        """actions: int bitmask [B, A] or multidiscrete [B, A, 6].

        Returns (obs [B,A,H,W,3] u8, rewards [B,A] f32, dones [B] bool,
        true_objective [B,A] f32) — all device arrays.
        """
        if self.state is None:
            self.reset()
        actions = jnp.asarray(actions)
        if actions.ndim == 3:
            actions = multidiscrete_to_bitmask(actions)
        actions = self._put(actions.astype(jnp.int32))

        if self.render_obs and self._use_classes:
            result = self._vstep_sim(self.state, self.next_scenes, actions,
                                     self.shaping)
            self.state = result.state
            obs = self._render_classes(result.state)
        elif (self.render_obs and self._backend == "pallas"
              and self._dispatch_mode() == "split"):
            # keep the Pallas render off the sim dependency chain: the two
            # dispatches overlap on the tunnel (see _dispatch_mode)
            result = self._vstep_sim(self.state, self.next_scenes, actions,
                                     self.shaping)
            self.state = result.state
            obs = self._vrender(result.state)
        else:
            result = self._vstep(self.state, self.next_scenes, actions,
                                 self.shaping)
            self.state = result.state
            obs = result.obs

        self._accumulate_dones(result.done)
        self._steps_since_poll += 1
        if self._steps_since_poll >= DONE_POLL_INTERVAL:
            self._refill_consumed_slots()

        return obs, result.reward, result.done, result.true_objective

    def step_many(self, action_pool: jax.Array, n_steps: int):
        """Run `n_steps` env steps back-to-back (throughput path).

        `action_pool` is a device array [K, B, A] of int32 bitmasks; step i
        uses pool[i % K]. Returns (last_obs, dones [n, B], checksums) where
        checksums is a non-empty list whose LAST element depends on the whole
        chunk (block on it to force execution). Every step's observation
        tensor is materialized on device (it is a program output / scan
        carry); the checksum is computed once per chunk — re-reading the full
        frame batch for a per-step sum costs more HBM traffic than rendering
        it.

        Two execution modes:
        - real TPU hardware (and CPU tests): ONE jitted lax.scan — a single
          dispatch for the whole chunk, matching the reference's one task
          dispatch per step (vector_env.cpp:48-87). Forced with
          MEGAVERSE_SCAN_STEPS=1.
        - tunneled dev TPU (utils/platform.is_tunneled_tpu): a Python loop of
          single jitted step dispatches, which pipeline asynchronously. On
          the tunnel a Pallas call inside an XLA loop degrades to a ~100 ms
          host round-trip per iteration, so the scan path is wrong THERE
          only. Forced with MEGAVERSE_SCAN_STEPS=0.

        n_steps must stay below the shortest episode length in steps so a
        layout-buffer slot cannot be consumed twice within one chunk
        (asserted against the scenario's base episode_length_sec — per-episode
        extensions like TowerBuilding's +4 s/box only lengthen episodes).
        """
        if self.state is None:
            self.reset()
        min_ep_steps = int(
            float(self.scenario.cfg.params.get(C.P_EPISODE_LENGTH_SEC, 60.0))
            / self.scenario.cfg.dt)
        if n_steps >= min_ep_steps:
            raise ValueError(
                f"step_many(n_steps={n_steps}) >= shortest episode "
                f"({min_ep_steps} steps): a layout-buffer slot could be "
                f"consumed twice before refill; use smaller chunks")

        # Refill overlap (docs/obstacles_easy_vs_hard.md lever #2): instead
        # of refilling consumed slots synchronously BEFORE the chunk — which
        # serializes host generation + upload + scatter between device
        # chunks — snapshot the pending dones, dispatch the whole chunk
        # first, then refill from the snapshot while the chunk executes on
        # device. Correctness window: a slot consumed in chunk N is
        # guaranteed refilled before chunk N+2 executes (the scatter is
        # dispatched during N+1 and the N+2 step programs take the
        # scattered buffer as a data dependency), so the shortest episode
        # must span TWO chunks. Scenarios with episodes shorter than that
        # keep the synchronous pre-chunk refill (window = one chunk).
        import os

        overlap = (2 * n_steps < min_ep_steps
                   and not os.environ.get("MEGAVERSE_NO_REFILL_OVERLAP"))
        if not overlap:
            self._refill_consumed_slots()

        if self._use_scan_steps():
            out = self._step_many_scan(
                jnp.asarray(action_pool, jnp.int32), n_steps)
            if overlap:
                self._overlap_refill_tick()
            return out

        mode = None
        if self._backend == "pallas" and not self._use_classes:
            mode = self._dispatch_mode()
        # One timed warmup chunk per dispatch mode, then lock in the winner
        # (see _dispatch_mode). n_steps >= 8 keeps trial noise down; tiny
        # chunks (tests) just use the trial-order mode without recording.
        trial = mode is not None and self._dmode is None and n_steps >= 8
        split = self._use_classes or mode == "split"
        if not split and not hasattr(self, "_chunk_fused"):
            def fused(state, next_scenes, action, shaping, pending):
                res = self._step_render(state, next_scenes, action, shaping)
                return res.state, res.obs, res.done, pending | res.done

            self._chunk_fused = jax.jit(fused, donate_argnums=self._donate_state() and (0, 4))
        if not hasattr(self, "_obs_sum"):
            self._obs_sum = jax.jit(lambda o: jnp.sum(o, dtype=jnp.int32))

        dones = []
        obs = None
        # Pre-split the action pool on the HOST and upload each row once:
        # per-step device indexing would add a dispatch (and a distinct
        # program compile per index) per step.
        if isinstance(action_pool, np.ndarray):
            rows = action_pool.astype(np.int32)
        else:
            rows = np.asarray(jax.device_get(action_pool)).astype(np.int32)
        pool_steps = [self._put(rows[k]) for k in range(rows.shape[0])]
        t_trial = None
        for i in range(n_steps):
            if trial and i == 1:
                # step 0 warmed (compiled) this mode's programs; fence it and
                # time the remaining steps
                import time as _time

                _ = int(self._obs_sum(obs))
                t_trial = _time.perf_counter()
            act = pool_steps[i % len(pool_steps)]
            if split:
                # class-partitioned or pallas render hangs off the sim chain
                # as independent dispatches
                res = self._vstep_sim(self.state, self.next_scenes, act, self.shaping)
                self.state = res.state
                obs = (self._render_classes(res.state) if self._use_classes
                       else self._vrender(res.state))
                done = res.done
                self._accumulate_dones(done)
            else:
                pending = (self._pending_dones if self._pending_dones is not None
                           else jnp.zeros((self.num_envs,), bool))
                self.state, obs, done, pending = self._chunk_fused(
                    self.state, self.next_scenes, act, self.shaping, pending)
                self._pending_dones = pending
            dones.append(done)
        self._steps_since_poll = 0  # refilled at next step_many/flush
        # One checksum per chunk; it depends on the final obs, whose chain
        # covers every step in the chunk.
        csum = self._obs_sum(obs)
        if overlap:
            self._overlap_refill_tick()
        if t_trial is not None:
            import time as _time

            _ = int(csum)  # fence the timed section
            ms = (_time.perf_counter() - t_trial) / (n_steps - 1) * 1e3
            self._note_dispatch_trial(mode, ms)
        return obs, dones, [csum]

    def _step_many_scan(self, pool: jax.Array, n_steps: int):
        if not hasattr(self, "_scan_fns"):
            self._scan_fns = {}
        key = (n_steps, pool.shape)
        if key not in self._scan_fns:
            vstep = self._step_render

            def run(state, next_scenes, pool, shaping):
                def body(carry, i):
                    state, _ = carry
                    res = vstep(state, next_scenes, pool[i % pool.shape[0]], shaping)
                    return (res.state, res.obs), res.done

                shape = (state.done.shape[0], self.num_agents_per_env,
                         self.scenario.cfg.obs_height, self.scenario.cfg.obs_width)
                if self.obs_format == "packed":
                    obs0 = jnp.zeros(shape, jnp.int32)
                else:
                    obs0 = jnp.zeros(shape + (3,), jnp.uint8)
                (state, last_obs), dones = jax.lax.scan(
                    body, (state, obs0), jnp.arange(n_steps))
                # One checksum per chunk (the obs carry already forces every
                # frame to materialize; a per-step full-frame re-read for a
                # sum would double the obs HBM traffic).
                csum = jnp.sum(last_obs, dtype=jnp.int32)
                return state, dones, csum, last_obs

            self._scan_fns[key] = jax.jit(run, donate_argnums=self._donate_state())

        self.state, dones, csum, last_obs = self._scan_fns[key](
            self.state, self.next_scenes, pool, self.shaping
        )
        self._accumulate_dones(jnp.any(dones, axis=0))
        self._steps_since_poll = 0
        return last_obs, dones, [csum]

    def flush(self) -> None:
        """Force buffer refill bookkeeping (call before relying on layouts)."""
        self._refill_consumed_slots()

    def render(self) -> jax.Array:
        """Re-render the current state (all env x agent views), through the
        same render path as step (size classes / bucketed tables)."""
        if self.state is None:
            return self.reset()
        if self._use_classes:
            return self._render_classes(self.state)
        return self._vrender(self.state)

    def _accumulate_dones(self, done: jax.Array) -> None:
        if not hasattr(self, "_acc_dones_fn"):
            self._acc_dones_fn = jax.jit(jnp.logical_or)
        self._pending_dones = (
            done if self._pending_dones is None
            else self._acc_dones_fn(self._pending_dones, done))

    def _refill_consumed_slots(self) -> None:
        self._steps_since_poll = 0
        self._apply_refill_bits(self._take_refill_stash())
        mask = self._pending_dones
        self._pending_dones = None
        if mask is None:
            return
        # Device->host transfers through the dev-TPU tunnel are extremely slow,
        # so gate on a scalar and ship a bit-packed mask instead of the bool
        # array.
        if not bool(jnp.any(mask)):
            return
        self._apply_refill_bits(self._pack_mask(mask))

    # -- refill overlap machinery (docs/obstacles_easy_vs_hard.md lever #2) --
    # The packed done-bits of chunk N are computed as a device op queued
    # immediately AFTER chunk N's steps and copied to the host
    # asynchronously; they are resolved (host layout generation + upload +
    # scatter) at the end of chunk N+1's dispatch, so the device rolls from
    # chunk N straight into N+1 while the host prepares the refill, and the
    # scatter lands in the stream ahead of chunk N+2 — which is the first
    # chunk that could consume a slot freed in chunk N (the 2-chunk episode
    # window asserted in step_many).
    def _pack_mask(self, mask) -> jax.Array:
        pad = (-mask.shape[0]) % 8
        if pad:
            mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
        if not hasattr(self, "_pack_mask_fn"):
            self._pack_mask_fn = jax.jit(lambda m: jnp.sum(
                m.reshape(-1, 8).astype(jnp.int32) << jnp.arange(8)[None, :],
                axis=-1).astype(jnp.uint8))
        return self._pack_mask_fn(mask)

    def _overlap_refill_tick(self) -> None:
        """End-of-chunk overlap step: stash THIS chunk's done-bits (pack
        queued right behind its steps + async host copy), then resolve the
        PREVIOUS chunk's stash — whose copy needed only the previous chunk,
        already executed or executing — into generation + upload + scatter
        while this chunk runs on device."""
        import os
        import time as _t

        timing = os.environ.get("MEGAVERSE_TIMING")
        t0 = _t.perf_counter()
        deferred = self._take_refill_stash()
        self._stash_pending_refill()
        t1 = _t.perf_counter()
        self._apply_refill_bits(deferred)
        self._steps_since_poll = 0
        if timing:
            print(f"[overlap] stash {1e3*(t1-t0):.1f} ms "
                  f"apply {1e3*(_t.perf_counter()-t1):.1f} ms", flush=True)

    def _stash_pending_refill(self) -> None:
        """Queue this chunk's done-bits pack + async host copy (overlap)."""
        mask = self._pending_dones
        self._pending_dones = None
        if mask is None:
            return
        packed = self._pack_mask(mask)
        try:
            packed.copy_to_host_async()
        except Exception:
            pass  # backends without async copy just block in np.asarray later
        self._deferred_refill = packed

    def _take_refill_stash(self):
        packed = getattr(self, "_deferred_refill", None)
        self._deferred_refill = None
        return packed

    def _apply_refill_bits(self, packed_bits) -> None:
        if packed_bits is None:
            return
        import os
        import time as _t

        timing = os.environ.get("MEGAVERSE_TIMING")
        t0 = _t.perf_counter()
        dones = np.unpackbits(np.asarray(packed_bits), bitorder="little")[
            : self.num_envs]
        if timing:
            print(f"[refill] bits-wait {1e3*(_t.perf_counter()-t0):.1f} ms "
                  f"n={int(dones.sum())}", flush=True)
        idx = np.nonzero(dones)[0]
        if idx.size == 0:
            return
        # Fixed slot ladder for the refill upload + scatter: every DISTINCT
        # row count is a separate compiled program (seconds each through a
        # remote-TPU tunnel) and done counts vary per poll — unpadded, every
        # refill recompiled (measured: 13.9 s stalls vs the ~140 ms steady
        # state). Padding happens HOST-side (so the upload shape is fixed
        # too); sentinel coords == num_envs are dropped by the scatter.
        # 1.5x rungs (64/96/128/192/...) instead of pure doubling: short-
        # episode scenarios sit just past a power of two (ObstaclesEasy:
        # ~65 resets per 64-step chunk at 1024 envs), and the padded rows are
        # real upload bytes — 65 -> 96 ships ~25% less than 65 -> 128
        # (~89 -> 67 MB/chunk at its ~698 KB/env layout pytree; see
        # docs/obstacles_easy_vs_hard.md).
        n = idx.size
        slots = refill_slot_rung(n, self.num_envs)
        t1 = _t.perf_counter()
        new_scenes = self._generate_batch(idx.tolist(), pad_to=slots)
        if timing:
            print(f"[refill] gen+upload {1e3*(_t.perf_counter()-t1):.1f} ms "
                  f"slots={slots}", flush=True)
        idx_dev = jnp.asarray(np.concatenate(
            [idx.astype(np.int32),
             np.full((slots - n,), self.num_envs, np.int32)]))
        if not hasattr(self, "_scatter_fns"):
            self._scatter_fns = {}
        if slots not in self._scatter_fns:
            self._scatter_fns[slots] = jax.jit(
                lambda buf, new, ii: jax.tree.map(
                    lambda b, nn: b.at[ii].set(nn, mode="drop"), buf, new),
                out_shardings=self._out_shard())
        self.next_scenes = self._scatter_fns[slots](
            self.next_scenes, new_scenes, idx_dev)
        if self._use_classes:
            # done envs consumed their buffered layout; the new one is buffered
            self._cls_rows_cur[idx] = self._cls_rows_buf[idx]
            self._cls_rows_buf[idx] = self._last_gen_rows
            self._rebuild_class_groups()
        self._update_bucket()

    # -------------------------------------------------------------- shaping
    def get_reward_shaping(self, env_idx: int, agent_idx: int) -> Dict[str, float]:
        row = np.asarray(self.shaping[env_idx, agent_idx])
        return dict(zip(self.scenario.all_shaping_keys, row.tolist()))

    def set_reward_shaping(self, env_idx: int, agent_idx: int, rs: Dict[str, float]) -> None:
        keys = self.scenario.all_shaping_keys
        row = np.asarray(self.shaping[env_idx, agent_idx]).copy()
        for k, v in rs.items():
            if k in keys:
                row[keys.index(k)] = v
        self.shaping = self.shaping.at[env_idx, agent_idx].set(jnp.asarray(row))

    @property
    def action_space_sizes(self):
        return list(C.ACTION_SPACE_SIZES)

    @staticmethod
    def unpack_obs(obs: jax.Array) -> jax.Array:
        """packed int32 [..., H, W] -> uint8 [..., H, W, 3] (host-side use)."""
        from megaverse_tpu.ops.raycast_pallas import unpack_rgb

        if obs.dtype == jnp.uint8:
            return obs
        return unpack_rgb(obs)
