"""Policy playback (counterpart of megaverse_rl/enjoy_megaverse.py).

Loads a checkpoint written by megaverse_tpu.rl.train, rolls episodes with the
greedy/sampled policy, reports per-episode reward and true objective, and can
record frames.

  python -m megaverse_tpu.rl.enjoy --env Empty \
      --checkpoint /tmp/megaverse_tpu_train/default/checkpoint.pkl --episodes 3
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from megaverse_tpu import constants as C
from megaverse_tpu.models.actor_critic import ActorCritic, sample_actions
from megaverse_tpu.types import multidiscrete_to_bitmask
from megaverse_tpu.vector_env import VectorEnv


def main(argv=None):
    from megaverse_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Empty")
    p.add_argument("--checkpoint", required=False, default=None)
    p.add_argument("--num_agents_per_env", type=int, default=1)
    p.add_argument("--episodes", type=int, default=2)
    p.add_argument("--max_steps", type=int, default=450)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hidden_size", type=int, default=512)
    p.add_argument("--use_rnn", type=int, default=1)
    p.add_argument("--rnn_num_layers", type=int, default=2)
    p.add_argument("--record_dir", default=None)
    args = p.parse_args(argv)

    env = VectorEnv(args.env, num_envs=1,
                    num_agents_per_env=args.num_agents_per_env, seed=args.seed)
    model = ActorCritic(hidden_size=args.hidden_size, use_rnn=bool(args.use_rnn),
                        rnn_num_layers=args.rnn_num_layers)

    obs = env.reset()
    if args.checkpoint:
        with open(args.checkpoint, "rb") as f:
            ckpt = pickle.load(f)
        params = jax.tree.map(jnp.asarray, ckpt["params"])
        print(f"loaded checkpoint at {ckpt.get('steps', '?')} steps")
    else:
        params = model.init(jax.random.PRNGKey(0), env.unpack_obs(obs)[0])
        print("no checkpoint given: random policy weights")

    apply = jax.jit(lambda p, o, c: model.apply(p, o, c))
    rng = jax.random.PRNGKey(args.seed)
    frames = []

    for ep in range(args.episodes):
        carry = model.initial_carry((1, args.num_agents_per_env))
        total = np.zeros(args.num_agents_per_env)
        for step in range(args.max_steps):
            rng, k = jax.random.split(rng)
            logits, value, carry = apply(params, obs, carry)
            actions, _ = sample_actions(logits, k)
            mask = multidiscrete_to_bitmask(actions)
            obs, rew, done, tobj = env.step(np.asarray(mask))
            total += np.asarray(rew)[0]
            if args.record_dir:
                frames.append(np.concatenate(
                    list(np.asarray(env.unpack_obs(obs))[0]), axis=1))
            if bool(np.asarray(done)[0]):
                print(f"episode {ep}: {step+1} steps, reward {total.round(3)}, "
                      f"true_objective {np.asarray(tobj)[0].round(3)}")
                break
        else:
            print(f"episode {ep}: truncated at {args.max_steps} steps, "
                  f"reward {total.round(3)}")

    if args.record_dir and frames:
        from PIL import Image

        out = Path(args.record_dir)
        out.mkdir(parents=True, exist_ok=True)
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(out / "enjoy.gif", save_all=True, append_images=imgs[1:],
                     duration=66, loop=0)
        print(f"wrote {len(frames)} frames to {out}/enjoy.gif")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
