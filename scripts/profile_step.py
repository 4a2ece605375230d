"""Split the step wall-time into sim / render / fused on the current backend.

Usage: python scripts/profile_step.py [--scenario Empty] [--num_envs 4096]
       [--num_agents 1] [--steps 64]

Times three jitted programs independently (each warmed first):
  sim     — vmapped env_step without rendering
  render  — batched raycast of a fixed state snapshot
  fused   — sim + render + obs checksum (the bench path)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# Renderer backend follows VectorEnv's automatic pick; set MEGAVERSE_RENDERER
# to profile a specific one.

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="Empty")
    p.add_argument("--num_envs", type=int, default=4096)
    p.add_argument("--num_agents", type=int, default=1)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler trace of the timed section "
                        "(view with xprof/tensorboard)")
    args = p.parse_args()

    from megaverse_tpu.vector_env import VectorEnv
    import megaverse_tpu.constants as C

    env = VectorEnv(args.scenario, num_envs=args.num_envs,
                    num_agents_per_env=args.num_agents, seed=42)
    env.reset()
    env.flush()

    rng = np.random.default_rng(0)
    md = np.stack(
        [rng.integers(0, s, size=(args.num_envs, args.num_agents))
         for s in C.ACTION_SPACE_SIZES], axis=-1)
    act = np.zeros(md.shape[:-1], np.int32)
    for h, bits in enumerate(C.ACTION_HEAD_BITS):
        act |= np.asarray(bits, np.int32)[md[..., h]]
    act = jnp.asarray(act)

    state0 = env.state

    import contextlib

    def trace_cm(name):
        if not args.trace_dir:
            return contextlib.nullcontext()
        return jax.profiler.trace(
            os.path.join(args.trace_dir, name.split()[0]))

    # Timing fence: on the tunneled axon platform, block_until_ready of a
    # result whose program contains certain custom calls (Pallas) can resolve
    # BEFORE execution finishes; only a concrete value fetch is a reliable
    # fence (same caveat as bench.py). Fence by fetching a scalar element of
    # the final output.
    _sum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def _fence(out):
        leaf = jax.tree.leaves(out)[0]
        _ = float(_sum(leaf))  # scalar fetch; full-array pulls distort timing

    def timeit(name, fn, *fargs):
        out = fn(*fargs)
        _fence(out)
        with trace_cm(name):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(*fargs)
            _fence(out)
            dt = (time.perf_counter() - t0) / args.steps
        fps = args.num_envs * args.num_agents / dt
        print(f"{name:28s} {dt*1e3:9.3f} ms/step   {fps:12.0f} obs/s-equivalent")
        return dt

    # sim only (state -> state), self-chained to model the dependent chain
    sim = env._vstep_sim
    def sim_chain(state):
        res = sim(state, env.next_scenes, act, env.shaping)
        return res.state
    t_sim = timeit("sim (no render)", sim_chain, state0)

    # render only, fixed input state
    t_render = timeit("render (fixed state)", env._vrender, state0)

    # render + checksum
    t_rsum = timeit("render+checksum", env._vrender_sum, state0)

    # fused bench path
    pending = jnp.zeros((args.num_envs,), bool)
    if not hasattr(env, "_chunk_fused"):
        def fused(state, next_scenes, action, shaping, pending):
            res = env._step_render(state, next_scenes, action, shaping)
            return (res.state, res.obs, res.done,
                    jnp.sum(res.obs, dtype=jnp.int32), pending | res.done)
        env._chunk_fused = jax.jit(fused)
    def fused_chain(state):
        state, obs, done, csum, p = env._chunk_fused(
            state, env.next_scenes, act, env.shaping, pending)
        return state
    t_fused = timeit("fused sim+render+sum", fused_chain, state0)

    print(f"\nbucket={env._bucket}  backend={jax.default_backend()}  "
          f"renderer={env._backend}")
    print(f"sim {t_sim*1e3:.2f} + render {t_render*1e3:.2f} "
          f"≈ fused {t_fused*1e3:.2f} ms")


if __name__ == "__main__":
    main()
