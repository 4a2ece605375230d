"""Split the Pallas render path into stages and time each on the current
backend: table/cluster build, per-tile frustum cull + sort, kernel launch.

Usage: python scripts/profile_render_stages.py [--scenario Collect]
       [--num_envs 1024] [--num_agents 1] [--steps 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _fence(out):
    # On the tunneled axon platform, block_until_ready of results whose graph
    # contains certain custom calls can resolve before execution finishes; a
    # concrete scalar VALUE fetch cannot (same fence bench.py uses).
    leaf = jax.tree.leaves(out)[-1]
    return float(jnp.real(jnp.ravel(leaf)[0].astype(jnp.float32)))


def timeit(fn, *args, steps):
    out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _fence(out)
    return (time.perf_counter() - t0) / steps * 1e3, out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scenario", default="Collect")
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--num_agents", type=int, default=1)
    p.add_argument("--steps", type=int, default=32)
    args = p.parse_args()

    from megaverse_tpu.vector_env import VectorEnv
    from megaverse_tpu.ops import raycast_pallas as RP

    env = VectorEnv(args.scenario, num_envs=args.num_envs,
                    num_agents_per_env=args.num_agents, seed=42)
    env.reset()
    env.flush()
    states = env.state
    scen = env.scenario
    cfg = scen.cfg
    bucket = getattr(env, "_bucket", None)
    h, w = cfg.obs_height, cfg.obs_width

    # Stage 0: tables (bucketed like VectorEnv's render path does).
    from megaverse_tpu.env import render_batch

    remaining = jnp.maximum(
        0.0, (states.episode_len_sec - states.episode_sec) / states.episode_len_sec)
    include_agents = cfg.num_agents > 1

    def bucket_slice(states):
        if bucket is None:
            return states
        mb, pb = bucket
        segments = cfg.prop_segments
        if segments:
            counts = [min(int(k), cap)
                      for k, (_, _, cap) in zip(pb, segments)]
            keep = [(pt, s0, k)
                    for (pt, s0, cap), k in zip(segments, counts) if k]
            props = jax.tree.map(
                lambda x: jnp.concatenate(
                    [x[:, s:s + k] for _, s, k in keep], axis=1), states.props)
        else:
            props = jax.tree.map(lambda x: x[:, :max(1, int(pb))], states.props)
        return states.replace(
            box_lo=states.box_lo[:, :mb], box_hi=states.box_hi[:, :mb],
            box_color=states.box_color[:, :mb], props=props)

    @jax.jit
    def build(states, remaining):
        states = bucket_slice(states)
        cams = jax.vmap(lambda s, tf: RP.build_cams(cfg, s.agents, tf))(
            states, remaining)
        prims = jax.vmap(
            lambda s: RP.build_prim_table(
                cfg, s.box_lo, s.box_hi, s.box_color, s.props, s.agents,
                include_agent_rows=include_agents))(states)
        prims, clusters = jax.vmap(RP.build_clusters)(prims)
        clusters, _ = jax.vmap(RP.build_superclusters)(clusters)
        prims = jax.vmap(RP.pad_prims_to_clusters)(prims, clusters)
        return cams, prims, clusters

    @jax.jit
    def cull(cams, clusters):
        return RP.cull_bits(cams, clusters, h, w)

    merge = bool(os.environ.get("MEGAVERSE_MERGE_TILES"))

    @jax.jit
    def kernel(cams, prims, clusters, sclist, clbits, scdist, cdist):
        return RP.render_packed(cams, prims, h, w, clusters=clusters,
                                scbits=sclist, clbits=clbits,
                                scdist=scdist, cdist=cdist,
                                merge_tiles=merge)

    @jax.jit
    def full(states, remaining):
        return render_batch(scen, states, fmt="packed", backend="pallas",
                            bucket=bucket)

    ms_build, (cams, prims, clusters) = timeit(build, states, remaining,
                                               steps=args.steps)
    ms_cull, (sclist, clbits, scdist, cdist) = timeit(
        cull, cams, clusters, steps=args.steps)
    ms_kernel, _ = timeit(kernel, cams, prims, clusters, sclist, clbits,
                          scdist, cdist, steps=args.steps)
    ms_full, _ = timeit(full, states, remaining, steps=args.steps)

    n = args.num_envs * args.num_agents
    print(f"prims={prims.shape} clusters={clusters.shape} sclist={sclist.shape}")
    for name, ms in (("table+cluster build", ms_build),
                     ("cull_bits", ms_cull),
                     ("pallas kernel", ms_kernel),
                     ("full render_batch", ms_full)):
        print(f"{name:22s} {ms:8.3f} ms/step   {n / ms * 1e3:10.0f} obs/s-equiv")


if __name__ == "__main__":
    main()
