"""Attribute the training-step wall-time on the current backend.

Usage: python scripts/profile_train_step.py [--scenario Collect]
       [--num_envs 1024] [--num_agents 1] [--rollout 32] [--iters 3]

Times, each as its own warmed jitted program:
  sim            — vmapped env_step, no render (the physics+logic slice)
  render         — batched raycast of a fixed state
  policy fwd     — ActorCritic forward (conv+GRU+heads) on one obs batch
  rollout step   — ONE fused dispatch of policy+env+render (the host-driven
                   rollout unit; x rollout per train step)
  forward-seq    — the update's scan re-forward over the whole rollout
  update         — full PPO update (forward-seq + GAE + backward + optax)

and derives train env-steps/s vs pure-sampling env-steps/s. This is the
committed learner attribution the reference's APPO asynchrony argument is
judged against (README.md:125-134: SF overlaps acting and learning across
processes; here both run on one chip, so the budget must be visible).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="Collect")
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--num_agents", type=int, default=1)
    p.add_argument("--rollout", type=int, default=32)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    from megaverse_tpu.env import env_step, render_batch
    from megaverse_tpu.rl.learner import Learner, TrainConfig
    from megaverse_tpu.scenarios import make_scenario
    from megaverse_tpu.types import state_from_scene

    scen = make_scenario(args.scenario, num_agents=args.num_agents)
    gens = [np.random.default_rng(i) for i in range(args.num_envs)]
    scenes = [scen.generate(g) for g in gens]
    stack = lambda *xs: jnp.stack([jnp.asarray(x) for x in xs])
    batch_scene = jax.tree.map(stack, *scenes)
    next_scenes = jax.tree.map(stack, *[scen.generate(g) for g in gens])
    keys = jax.random.split(jax.random.PRNGKey(0), args.num_envs)
    env_state = jax.jit(jax.vmap(
        lambda sc, k: state_from_scene(sc, args.num_agents, k)
    ))(batch_scene, keys)

    cfg = TrainConfig(rollout=args.rollout, use_rnn=True)
    learner = Learner(scen, args.num_envs, cfg)
    obs = jax.jit(lambda s: render_batch(
        scen, s, fmt="packed", bucket=learner.render_bucket))(env_state)
    ls = learner.init(jax.random.PRNGKey(42), env_state, obs)
    shaping = jnp.asarray(
        np.tile(scen.shaping_array()[None], (args.num_envs, 1, 1)))

    def _fence(out):
        # On the tunneled axon platform, block_until_ready of results whose
        # graph contains certain custom calls can resolve before execution
        # finishes; a concrete scalar VALUE fetch cannot (same fence
        # bench.py / profile_render_stages.py use).
        leaf = jax.tree.leaves(out)[-1]
        return float(jnp.real(jnp.ravel(leaf)[0].astype(jnp.float32)))

    def timeit(name, fn, *fargs, reps=None):
        reps = reps or max(args.iters, 3)
        _fence(fn(*fargs))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*fargs)
        _fence(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:26s} {dt*1e3:10.2f} ms", flush=True)
        return dt

    # --- pieces ---
    from megaverse_tpu.env import apply_deferred_resets, should_defer_reset
    defer = should_defer_reset(scen)
    vstep = jax.jit(jax.vmap(
        functools.partial(env_step, scen, render_obs=False,
                          defer_reset=defer), in_axes=(0, 0, 0, 0)))
    act0 = jnp.zeros((args.num_envs, args.num_agents), jnp.int32)
    t_sim = timeit("sim (env_step)", vstep, env_state, next_scenes, act0,
                   shaping)

    rend = jax.jit(lambda s: render_batch(scen, s, fmt="packed",
                                          bucket=learner.render_bucket))
    t_render = timeit("render", rend, env_state)

    pol = jax.jit(lambda p, o, c: learner.model.apply(p, o, c))
    t_policy = timeit("policy fwd", pol, ls.params, ls.obs, ls.carry)

    step_fn = learner._host_rollout_step_fn()
    t_rstep = timeit("rollout step (fused)", step_fn, ls.params, ls.env_state,
                     ls.obs, ls.carry, ls.rng, next_scenes, shaping)

    # --- update pieces: need a real rollout batch ---
    env_s, obs_s, rnn, rng = ls.env_state, ls.obs, ls.carry, ls.rng
    outs = []
    for _ in range(args.rollout):
        prev_obs = obs_s
        (env_s, obs_s, rnn, rng), out = step_fn(
            ls.params, env_s, prev_obs, rnn, rng, next_scenes, shaping)
        outs.append((prev_obs,) + out)
    traj = [jnp.stack(x) for x in zip(*outs)]
    from megaverse_tpu.rl.learner import RolloutBatch
    batch = RolloutBatch(*traj, init_carry=ls.carry)
    ls2 = ls._replace(env_state=env_s, obs=obs_s, carry=rnn, rng=rng)

    fwd_seq = jax.jit(lambda p, b: learner._forward_sequence(p, b))
    t_fseq = timeit("forward-seq (update fwd)", fwd_seq, ls.params, batch)

    upd = jax.jit(functools.partial(learner._update_from_batch,
                                    axis_name=None))
    t_upd = timeit("update (fwd+bwd+optax)", upd, ls2, batch)

    n = args.rollout * args.num_envs * args.num_agents
    t_train = args.rollout * t_rstep + t_upd
    t_sample = args.rollout * max(t_sim + t_render, 1e-9)
    print(f"\nrollout {args.rollout} x fused {t_rstep*1e3:.1f} ms "
          f"+ update {t_upd*1e3:.1f} ms = {t_train*1e3:.1f} ms/train-step")
    print(f"train      {n/t_train:10.0f} env-steps/s")
    print(f"sampling   {n/t_sample:10.0f} env-steps/s  (sim+render only)")
    print(f"train/sampling ratio {t_sample/t_train:6.1%}")
    print(f"update share {t_upd/t_train:6.1%}; policy-in-rollout share "
          f"{(t_rstep-t_sim-t_render)*args.rollout/t_train:6.1%} "
          f"(fused - sim - render, incl. dispatch delta)")


if __name__ == "__main__":
    main()
