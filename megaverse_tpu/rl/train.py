"""APPO-style training CLI.

Equivalent of megaverse_rl/train_megaverse.py (Sample Factory run_rl): one
process drives the whole pipeline on the accelerator — vectorized env rollouts
(physics + batched render inside jit) and PPO updates — with host-side episode
generation feeding the auto-reset layout buffer between steps.

Includes the reference integration features: team-spirit annealing 0 -> 1 over
max_team_spirit_steps via the runtime reward-shaping API
(megaverse_rl/megaverse_utils.py:75-84) and per-episode true-objective stats.

Usage:
  python -m megaverse_tpu.rl.train --env Collect --num_envs 512 \
      --train_for_env_steps 1000000 --num_agents_per_env 2
"""

from __future__ import annotations

import argparse
import pickle
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from megaverse_tpu import constants as C
from megaverse_tpu.env import render_batch
from megaverse_tpu.parallel import (ParallelLearner, make_mesh,
                                    maybe_initialize_distributed)
from megaverse_tpu.rl.learner import Learner, TrainConfig
from megaverse_tpu.scenarios import make_scenario
from megaverse_tpu.types import state_from_scene


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env", default="Empty", help="scenario name")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--megaverse_num_agents_per_env", "--num_agents_per_env",
                   dest="num_agents_per_env", type=int, default=1)
    p.add_argument("--train_for_env_steps", type=float, default=1e6)
    p.add_argument("--rollout", type=int, default=32)
    p.add_argument("--hidden_size", type=int, default=512)
    p.add_argument("--use_rnn", type=int, default=1)
    p.add_argument("--rnn_num_layers", type=int, default=2)
    p.add_argument("--reward_clip", type=float, default=30.0,
                   help="clamp |reward| before the PPO update; 0 disables")
    p.add_argument("--max_grad_norm", type=float, default=4.0,
                   help="global grad-norm clip; 0 disables (reference runs)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_final", type=float, default=-1.0,
                   help=">=0: linear lr decay to this value over the run")
    p.add_argument("--exploration_coeff", type=float, default=0.001)
    p.add_argument("--exploration_final", type=float, default=-1.0,
                   help=">=0: anneal the exploration coefficient to this "
                        "value with training progress")
    p.add_argument("--ppo_epochs", type=int, default=1,
                   help="PPO epochs over each rollout (SF --ppo_epochs)")
    p.add_argument("--num_minibatches", type=int, default=1,
                   help="env-axis minibatches per epoch")
    p.add_argument("--gamma", type=float, default=0.997)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_devices", type=int, default=None,
                   help="mesh size (default: all devices)")
    p.add_argument("--train_dir", default="/tmp/megaverse_tpu_train")
    p.add_argument("--experiment", default="default")
    p.add_argument("--save_every_steps", type=float, default=5e5)
    p.add_argument("--restart_behavior", choices=["resume", "restart"],
                   default="resume",
                   help="resume: restore checkpoint.pkl if present (Sample "
                        "Factory --restart_behavior); restart: train fresh")
    # team spirit annealing (megaverse_params.py:41-55)
    p.add_argument("--megaverse_increase_team_spirit", type=int, default=0)
    p.add_argument("--megaverse_max_team_spirit_steps", type=float, default=1e9)
    p.add_argument("--set_shaping", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="override a reward-shaping weight for training "
                        "(repeatable). Uses the runtime-mutable shaping API "
                        "the reference exposes for PBT "
                        "(scenario.hpp:209-215, megaverse_utils.py:80-84); "
                        "evaluation keeps scenario defaults.")
    return p.parse_args(argv)


class _Task:
    """One scenario's env batch, generators and learner state slice.

    Multitask training keeps one _Task per scenario; the policy/optimizer
    leaves are shared and round-robined across tasks — the TPU analogue of the
    reference multitask factory assigning one task per Sample Factory worker
    while a single learner updates shared weights
    (megaverse/megaverse_env.py:27-39, train_megaverse.py:32-42).
    """

    def __init__(self, name: str, args, cfg: TrainConfig, mesh, seed: int):
        self.name = name
        self.scenario = make_scenario(name, num_agents=args.num_agents_per_env)
        self.num_envs = args.num_envs
        self.cfg = cfg
        self.mesh = mesh
        self._segments = self.scenario.cfg.prop_segments
        self._hw_boxes = 0
        self._hw_props = ([0] * len(self._segments) if self._segments else 0)

        ss = np.random.SeedSequence(seed)
        self.gens = [np.random.Generator(np.random.PCG64(s))
                     for s in ss.spawn(self.num_envs)]

        first = self.gen_batch(range(self.num_envs))
        self.next_scenes = self.gen_batch(range(self.num_envs))
        # Render-table bucket (see env.render_batch): 1.5x headroom over the
        # initial high-water so episode-to-episode variation rarely forces the
        # expensive train-step recompile.
        self.bucket = self._bucket_for(margin=1.5)
        learner = Learner(self.scenario, self.num_envs, cfg,
                          render_bucket=self.bucket)
        self.plearner = ParallelLearner(learner, mesh)

        keys = jax.random.split(jax.random.PRNGKey(seed), self.num_envs)
        env_state = jax.jit(jax.vmap(
            lambda sc, k: state_from_scene(sc, args.num_agents_per_env, k)
        ))(first, keys)
        scen = self.scenario
        obs = jax.jit(lambda s: render_batch(
            scen, s, fmt="packed", bucket=self.bucket))(env_state)
        self.ls = self.plearner.init(jax.random.PRNGKey(seed), env_state, obs)
        self.shaping = jnp.asarray(
            np.tile(scen.shaping_array()[None], (self.num_envs, 1, 1)))
        self.spirit_col = scen.all_shaping_keys.index(C.P_TEAM_SPIRIT)

    def _bucket_for(self, margin: float):
        roundup = lambda n, q: ((max(int(n), 1) + q - 1) // q) * q
        if self._segments:
            # segmented prop tables (see render_batch): per-segment counts
            pb = tuple(roundup(n * margin, 4) for n in self._hw_props)
        else:
            pb = roundup(self._hw_props * margin, 4)
        return (roundup(self._hw_boxes * margin, 4), pb)

    def _bucket_grew(self) -> bool:
        if self._hw_boxes > self.bucket[0]:
            return True
        if self._segments:
            return any(n > b for n, b in zip(self._hw_props, self.bucket[1]))
        return self._hw_props > self.bucket[1]

    def _note_high_water(self, scenes) -> None:
        for sc in scenes:
            self._hw_boxes = max(
                self._hw_boxes, int((np.asarray(sc.box_color) > 0).sum()))
            types = np.asarray(sc.props.type)
            if self._segments:
                for i, (ptype, start, cap) in enumerate(self._segments):
                    n = int((types[start:start + cap] != C.PROP_NONE).sum())
                    self._hw_props[i] = max(self._hw_props[i], n)
            else:
                self._hw_props = max(
                    self._hw_props, int((types != C.PROP_NONE).sum()))

    def gen_batch(self, idx):
        scenes = [self.scenario.generate_checked(self.gens[i]) for i in idx]
        self._note_high_water(scenes)
        return jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *scenes)

    def refill(self, rollout: int) -> None:
        # Resolve the PREVIOUS rollout's async generation first: its scatter
        # lands in the stream before the step after next, and an env that
        # reset during rollout k cannot reset again before rollout k+3
        # (episodes span >= 3 rollouts), so the one-rollout delay is safe.
        # (Degenerate early-finish episodes shorter than 2 rollouts replay
        # their buffered layout once — same exposure the synchronous refill
        # had between its polls.)
        if getattr(self, "_pending_refill", None) is not None:
            idx, new_np = self._pending_refill.result()
            self._pending_refill = None
            self._apply_refill(idx, new_np)

        nf = np.asarray(self.ls.env_state.num_frames)
        # exactly the envs that reset DURING this rollout (consumed their
        # buffered layout): nf < rollout. The old `nf < 4*rollout` window
        # re-generated ~every env every rollout on short-episode scenarios
        # (BoxAGone: 1024 x 2.1 ms of host gen per 2.2 s train step).
        idx = np.nonzero(nf < rollout)[0]
        if idx.size:
            if getattr(self, "_gen_pool", None) is None:
                from concurrent.futures import ThreadPoolExecutor

                # single worker: per-env generator streams advance in
                # submission order, keeping layouts deterministic
                self._gen_pool = ThreadPoolExecutor(
                    1, thread_name_prefix=f"gen-{self.name}")
            self._pending_refill = self._gen_pool.submit(
                lambda ii: (ii, self.gen_batch_np(ii)), idx.tolist())

    def gen_batch_np(self, idx):
        """gen_batch, stacked host-side (worker thread; no device calls)."""
        scenes = [self.scenario.generate_checked(self.gens[i]) for i in idx]
        self._note_high_water(scenes)
        return jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *scenes)

    def _apply_refill(self, idx, new_np) -> None:
        # Fixed slot ladder + one cached jitted scatter per slot size (same
        # machinery as VectorEnv._apply_refill_bits): done counts vary per
        # rollout, and an unpadded .at[idx].set is a fresh multi-second
        # tunnel compile per DISTINCT count — measured as the dominant term
        # of the r4 BoxAGone training loop.
        from megaverse_tpu.vector_env import refill_slot_rung

        idx = np.asarray(idx)
        n = idx.size
        slots = refill_slot_rung(n, self.num_envs)
        if slots > n:
            new_np = jax.tree.map(
                lambda x: np.concatenate(
                    [x, np.repeat(x[:1], slots - n, axis=0)]), new_np)
        new = jax.tree.map(jnp.asarray, new_np)
        idx_dev = jnp.asarray(np.concatenate(
            [idx.astype(np.int32),
             np.full((slots - n,), self.num_envs, np.int32)]))
        if not hasattr(self, "_scatter_fns"):
            self._scatter_fns = {}
        if slots not in self._scatter_fns:
            self._scatter_fns[slots] = jax.jit(
                lambda buf, nn, ii: jax.tree.map(
                    lambda b, x: b.at[ii].set(x, mode="drop"), buf, nn))
        self.next_scenes = self._scatter_fns[slots](
            self.next_scenes, new, idx_dev)
        if self._bucket_grew():
            self.bucket = self._bucket_for(margin=1.5)
            learner = Learner(self.scenario, self.num_envs, self.cfg,
                              render_bucket=self.bucket)
            self.plearner = ParallelLearner(learner, self.mesh)
            print(f"[{self.name}] render bucket grew to {self.bucket}; "
                  "train step will recompile", flush=True)


def resolve_task_list(env_name: str):
    """'multitask_megaverse8' / 'multitask_obstacles' -> task list, else [env]."""
    if "multitask" not in env_name:
        return [env_name]
    from megaverse_tpu.gym_env import MEGAVERSE8, OBSTACLES_MULTITASK

    if env_name.endswith("megaverse8"):
        return list(MEGAVERSE8)
    if env_name.endswith("obstacles"):
        return list(OBSTACLES_MULTITASK)
    raise NotImplementedError(env_name)


def main(argv=None):
    maybe_initialize_distributed()
    from megaverse_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    args = parse_args(argv)
    num_envs = args.num_envs

    cfg = TrainConfig(rollout=args.rollout, lr=args.learning_rate,
                      gamma=args.gamma, hidden_size=args.hidden_size,
                      use_rnn=bool(args.use_rnn),
                      rnn_num_layers=args.rnn_num_layers,
                      reward_clip=args.reward_clip,
                      max_grad_norm=args.max_grad_norm,
                      num_epochs=args.ppo_epochs,
                      num_minibatches=args.num_minibatches,
                      exploration_coeff=args.exploration_coeff,
                      lr_final=args.lr_final,
                      exploration_final=args.exploration_final,
                      total_env_steps=float(args.train_for_env_steps))
    mesh = make_mesh(args.n_devices)

    names = resolve_task_list(args.env)
    tasks = [_Task(n, args, cfg, mesh, args.seed + 1000 * i)
             for i, n in enumerate(names)]
    for spec in args.set_shaping:
        key, _, val = spec.partition("=")
        for t in tasks:
            if key in t.scenario.all_shaping_keys:
                col = t.scenario.all_shaping_keys.index(key)
                t.shaping = t.shaping.at[:, :, col].set(float(val))
                print(f"[shaping] {t.name}: {key} = {float(val)}", flush=True)
            else:
                print(f"[shaping] {t.name} has no key {key!r}; skipped",
                      flush=True)
    # Policy weights and optimizer state are shared across tasks.
    params, opt_state = tasks[0].ls.params, tasks[0].ls.opt_state

    out_dir = Path(args.train_dir) / args.experiment
    out_dir.mkdir(parents=True, exist_ok=True)

    total = int(args.train_for_env_steps)
    steps_done = 0
    ckpt_path = out_dir / "checkpoint.pkl"
    if args.restart_behavior == "resume" and ckpt_path.exists():
        with open(ckpt_path, "rb") as f:
            ckpt = pickle.load(f)
        params = jax.tree.map(jnp.asarray, ckpt["params"])
        opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
        steps_done = int(ckpt["steps"])
        print(f"resumed from {ckpt_path} at {steps_done:,} env steps", flush=True)
    last_save = steps_done
    start_steps = steps_done
    t0 = time.perf_counter()
    it = 0
    while steps_done < total:
        task = tasks[it % len(tasks)]
        ls = task.ls._replace(params=params, opt_state=opt_state)
        ls, metrics = task.plearner.train_step(ls, task.next_scenes, task.shaping)
        task.ls = ls
        params, opt_state = ls.params, ls.opt_state
        steps_done += cfg.rollout * num_envs
        it += 1

        # Refill policy: every few iterations, regenerate layout-buffer slots
        # for envs that recently auto-reset (low frame counter). Each env's
        # generator stream advances only when its slot refills, so results
        # stay deterministic given the same reset pattern.
        if it % 4 == 0:
            for t in tasks:
                t.refill(cfg.rollout)

        # team spirit annealing (megaverse_utils.py:75-84)
        if args.megaverse_increase_team_spirit:
            frac = min(1.0, steps_done / args.megaverse_max_team_spirit_steps)
            for t in tasks:
                t.shaping = t.shaping.at[:, :, t.spirit_col].set(frac)

        if it % 10 == 0:
            m = {k: float(v) for k, v in metrics.items()}
            sps = (steps_done - start_steps) / (time.perf_counter() - t0)
            print(f"steps {steps_done:,}  {sps:,.0f} env-steps/s  "
                  f"task {task.name}  loss {m['loss']:.4f}  "
                  f"reward {m['reward_mean']:.4f}  "
                  f"entropy {m['entropy']:.3f}", flush=True)

        if steps_done - last_save >= args.save_every_steps:
            last_save = steps_done
            ckpt = {
                "params": jax.tree.map(np.asarray, params),
                "opt_state": jax.tree.map(np.asarray, opt_state),
                "steps": steps_done,
            }
            with open(out_dir / "checkpoint.pkl", "wb") as f:
                pickle.dump(ckpt, f)
            print(f"saved checkpoint at {steps_done:,} steps", flush=True)

    print(f"done: {steps_done:,} env steps in {time.perf_counter()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
