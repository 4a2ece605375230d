#!/usr/bin/env python
"""Headless episode recorder — the viewer_app equivalent for this framework.

Rolls one environment with random actions (or a trained checkpoint) and writes
agent-view frames plus a free overview camera to PNG files / an animated GIF.

  python scripts/record_episode.py --env Collect --steps 120 --out /tmp/ep
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="Collect")
    p.add_argument("--num_agents", type=int, default=2)
    p.add_argument("--steps", type=int, default=90)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default="/tmp/megaverse_episode")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--overview", action="store_true", help="also render overview frames")
    p.add_argument("--gif", action="store_true", help="write animated gif")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image

    import megaverse_tpu.constants as C
    from megaverse_tpu import VectorEnv
    from megaverse_tpu.env import render_custom_camera

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    env = VectorEnv(args.env, num_envs=1, num_agents_per_env=args.num_agents,
                    seed=args.seed, obs_format="rgb")
    obs = env.reset()
    rng = np.random.default_rng(args.seed)

    frames = []
    for step in range(args.steps):
        md = np.stack([rng.integers(0, s, size=(1, args.num_agents))
                       for s in C.ACTION_SPACE_SIZES], -1)
        obs, rew, done, tobj = env.step(md)
        row = np.concatenate(list(np.asarray(obs[0])), axis=1)  # agents side by side
        if args.overview:
            grid = env.scenario.cfg.grid
            center = np.asarray(grid.origin) + np.asarray(grid.dims) * grid.voxel_size / 2
            ov = np.asarray(render_custom_camera(
                env.scenario, jax.tree.map(lambda x: x[0], env.state),
                eye=(center[0], center[1] + np.max(grid.dims) * 0.7, center[2] + 6),
                yaw=0.0, pitch=-1.1,
                width=row.shape[1], height=128))
            row = np.concatenate([row, ov], axis=0)
        frames.append(row)
        if step % 30 == 0:
            Image.fromarray(row).save(out / f"frame_{step:04d}.png")

    if args.gif:
        imgs = [Image.fromarray(f).resize((f.shape[1] * 2, f.shape[0] * 2),
                                          Image.NEAREST) for f in frames]
        imgs[0].save(out / "episode.gif", save_all=True, append_images=imgs[1:],
                     duration=66, loop=0)
    print(f"wrote {len(frames)} frames to {out}")


if __name__ == "__main__":
    main()
