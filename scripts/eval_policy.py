"""Batched greedy evaluation of a training checkpoint.

Rolls N envs for a fixed horizon with the ARGMAX policy (no exploration
noise) and reports the per-step reward mean and per-episode return mean —
the exploit-mode counterpart of the stochastic reward_mean printed during
training (megaverse_rl/enjoy_megaverse.py's evaluation role, batched).

  python scripts/eval_policy.py --env Collect \
      --checkpoint runs/collect_demo_r3/checkpoint.pkl \
      --num_envs 512 --steps 900
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Collect")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num_envs", type=int, default=512)
    p.add_argument("--num_agents_per_env", type=int, default=1)
    p.add_argument("--steps", type=int, default=900)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--hidden_size", type=int, default=512)
    p.add_argument("--rnn_num_layers", type=int, default=2)
    args = p.parse_args()

    from megaverse_tpu.models.actor_critic import ActorCritic
    from megaverse_tpu.types import multidiscrete_to_bitmask
    from megaverse_tpu.vector_env import VectorEnv

    with open(args.checkpoint, "rb") as f:
        ckpt = pickle.load(f)
    params = ckpt["params"] if isinstance(ckpt, dict) and "params" in ckpt else ckpt

    env = VectorEnv(args.env, num_envs=args.num_envs,
                    num_agents_per_env=args.num_agents_per_env, seed=args.seed)
    model = ActorCritic(hidden_size=args.hidden_size, use_rnn=True,
                        rnn_num_layers=args.rnn_num_layers)
    obs = env.reset()
    b, a = args.num_envs, args.num_agents_per_env
    carry = model.initial_carry((b, a))

    @jax.jit
    def policy(params, obs, carry):
        if obs.dtype != jnp.uint8:
            from megaverse_tpu.ops.raycast_pallas import unpack_rgb
            obs = unpack_rgb(obs)
        logits, value, carry = model.apply(params, obs, carry)
        acts = jnp.stack([jnp.argmax(l, axis=-1) for l in logits], axis=-1)
        return multidiscrete_to_bitmask(acts), carry

    tot_reward = 0.0
    tot_done = 0
    ep_return = np.zeros((b, a), np.float64)
    finished_returns = []
    for t in range(args.steps):
        act, carry = policy(params, obs, carry)
        obs, rew, done, tobj = env.step(act)
        r = np.asarray(rew, np.float64)
        d = np.asarray(done)
        tot_reward += float(r.sum())
        ep_return += r
        if d.any():
            finished_returns.extend(ep_return[d].ravel().tolist())
            ep_return[d] = 0.0
            tot_done += int(d.sum())
        carry = jnp.where(jnp.asarray(d)[:, None, None], 0.0, carry)
    env.close()

    n = args.num_envs * args.num_agents_per_env * args.steps
    print(f"greedy reward/step mean: {tot_reward / n:+.5f} over {n} agent-steps")
    if finished_returns:
        fr = np.asarray(finished_returns)
        print(f"episodes finished: {len(fr)}  return mean {fr.mean():+.4f} "
              f"median {np.median(fr):+.4f}  frac>0 {float((fr > 0).mean()):.2%}")


if __name__ == "__main__":
    main()
