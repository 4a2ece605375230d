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
from megaverse_tpu.parallel import ParallelLearner, make_mesh
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
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--gamma", type=float, default=0.997)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_devices", type=int, default=None,
                   help="mesh size (default: all devices)")
    p.add_argument("--train_dir", default="/tmp/megaverse_tpu_train")
    p.add_argument("--experiment", default="default")
    p.add_argument("--save_every_steps", type=float, default=5e5)
    # team spirit annealing (megaverse_params.py:41-55)
    p.add_argument("--megaverse_increase_team_spirit", type=int, default=0)
    p.add_argument("--megaverse_max_team_spirit_steps", type=float, default=1e9)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    scenario = make_scenario(args.env, num_agents=args.num_agents_per_env)
    num_envs = args.num_envs

    cfg = TrainConfig(rollout=args.rollout, lr=args.learning_rate,
                      gamma=args.gamma, hidden_size=args.hidden_size,
                      use_rnn=bool(args.use_rnn))
    learner = Learner(scenario, num_envs, cfg)
    mesh = make_mesh(args.n_devices)
    plearner = ParallelLearner(learner, mesh)

    # Episode generation streams (one per env, master-seeded).
    ss = np.random.SeedSequence(args.seed)
    gens = [np.random.Generator(np.random.PCG64(s)) for s in ss.spawn(num_envs)]

    def gen_batch(idx):
        scenes = [scenario.generate(gens[i]) for i in idx]
        return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *scenes)

    first = gen_batch(range(num_envs))
    next_scenes = gen_batch(range(num_envs))
    keys = jax.random.split(jax.random.PRNGKey(args.seed), num_envs)
    env_state = jax.jit(jax.vmap(
        lambda sc, k: state_from_scene(sc, args.num_agents_per_env, k)))(first, keys)
    obs = jax.jit(lambda s: render_batch(scenario, s, fmt="packed"))(env_state)

    ls = plearner.init(jax.random.PRNGKey(args.seed), env_state, obs)
    shaping_np = np.tile(scenario.shaping_array()[None], (num_envs, 1, 1))
    shaping = jnp.asarray(shaping_np)
    spirit_col = scenario.all_shaping_keys.index(C.P_TEAM_SPIRIT)

    out_dir = Path(args.train_dir) / args.experiment
    out_dir.mkdir(parents=True, exist_ok=True)

    total = int(args.train_for_env_steps)
    steps_done = 0
    last_save = 0
    t0 = time.perf_counter()
    it = 0
    while steps_done < total:
        ls, metrics = plearner.train_step(ls, next_scenes, shaping)
        steps_done += cfg.rollout * num_envs
        it += 1

        # Refill policy: every few iterations, regenerate layout-buffer slots
        # for envs that recently auto-reset (low frame counter). Each env's
        # generator stream advances only when its slot refills, so results
        # stay deterministic given the same reset pattern.
        if it % 4 == 0:
            nf = np.asarray(ls.env_state.num_frames)
            idx = np.nonzero(nf < 4 * cfg.rollout)[0]
            if idx.size:
                new = gen_batch(idx.tolist())
                idx_dev = jnp.asarray(idx)
                next_scenes = jax.tree.map(
                    lambda buf, n: buf.at[idx_dev].set(n), next_scenes, new)

        # team spirit annealing (megaverse_utils.py:75-84)
        if args.megaverse_increase_team_spirit:
            frac = min(1.0, steps_done / args.megaverse_max_team_spirit_steps)
            shaping = shaping.at[:, :, spirit_col].set(frac)

        if it % 10 == 0:
            m = {k: float(v) for k, v in metrics.items()}
            sps = steps_done / (time.perf_counter() - t0)
            print(f"steps {steps_done:,}  {sps:,.0f} env-steps/s  "
                  f"loss {m['loss']:.4f}  reward {m['reward_mean']:.4f}  "
                  f"entropy {m['entropy']:.3f}", flush=True)

        if steps_done - last_save >= args.save_every_steps:
            last_save = steps_done
            ckpt = {
                "params": jax.tree.map(np.asarray, ls.params),
                "opt_state": jax.tree.map(np.asarray, ls.opt_state),
                "steps": steps_done,
            }
            with open(out_dir / "checkpoint.pkl", "wb") as f:
                pickle.dump(ckpt, f)
            print(f"saved checkpoint at {steps_done:,} steps", flush=True)

    print(f"done: {steps_done:,} env steps in {time.perf_counter()-t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
