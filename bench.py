"""Throughput benchmark: env-steps (= RGB observations) per second at 128x72.

Mirrors the reference's `megaverse_test_app --performance_test`
(src/apps/megaverse_test_app.cpp:149-171: N envs, random actions, FPS report)
and the DUMMY_SAMPLER sampling benchmark (megaverse_rl/sampling_benchmark.py).
Every step runs the full pipeline — action decode, KCC physics, scenario
logic, auto-reset, and the batched render whose observation tensor is forced
to materialize on device.

Default mode benches the whole Megaverse-8 suite (reference: the test app
reports Empty AND Collect, megaverse_test_app.cpp:190-194; we report every
task): one JSON line per scenario, then the aggregate as the FINAL line
(total obs / total wall time across the 8 tasks). `--scenario NAME` benches a
single scenario instead.

vs_baseline: per-scenario against the reference's published single-machine
figures where they exist (Empty ~75k, Collect ~27k obs/s, README.md:243-247);
the aggregate against the driver target pro-rated to one chip (>=1M obs/s on
one 8-chip v5e host => 125k/chip).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
# Renderer selection is automatic (VectorEnv._pick_backend): tiny scenes fuse
# the unrolled XLA renderer into the step program; heavy scenes use the
# cluster-culled Pallas kernel off the sim dependency chain. Override with
# MEGAVERSE_RENDERER.

import numpy as np

# Per-scenario reference throughput (BASELINE.md: 64 envs / 1 agent / Vulkan
# on a 10-core i9 + GPU, README.md:243-247). Scenarios without a published
# number fall back to the Empty figure.
BASELINE_FPS = {"empty": 75_000.0, "collect": 27_000.0}
BASELINE_EMPTY_FPS = BASELINE_FPS["empty"]
# Driver target (BASELINE.json): >=1M obs/s on one v5e host = 8 chips.
BASELINE_PER_CHIP_FPS = 1_000_000.0 / 8

# The Megaverse-8 task suite (megaverse/megaverse_env.py:11-20) in bench
# order, with per-task env counts sized so each task's timed section runs a
# few seconds on the dev chip.
MEGAVERSE8 = [
    "TowerBuilding", "ObstaclesEasy", "ObstaclesHard", "Collect",
    "Sokoban", "HexMemory", "HexExplore", "Rearrange",
]
SUITE_NUM_ENVS = int(os.environ.get("BENCH_SUITE_NUM_ENVS", "1024"))


def bench_scenario(scenario_name: str, num_envs: int, num_agents: int,
                   chunk: int = 64, chunks: int = 5,
                   n_devices: int = 1):
    """Returns (obs_per_sec, timed_obs, timed_seconds)."""
    import jax

    from megaverse_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()

    from megaverse_tpu.vector_env import VectorEnv
    import megaverse_tpu.constants as C

    device = None
    if n_devices > 1:
        # Shard the env batch over the mesh: every [B, ...] buffer splits on
        # its leading axis and the vmapped step runs SPMD, no collectives.
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("data",))
        device = NamedSharding(mesh, P("data"))

    env = VectorEnv(scenario_name, num_envs=num_envs,
                    num_agents_per_env=num_agents, seed=42, device=device)
    env.reset()

    rng = np.random.default_rng(0)
    n_pool = 16
    md = np.stack(
        [rng.integers(0, s, size=(n_pool, num_envs, num_agents))
         for s in C.ACTION_SPACE_SIZES], axis=-1)
    # bitmask conversion in numpy (device fetches are slow on dev tunnels)
    pool = np.zeros(md.shape[:-1], np.int32)
    for h, bits in enumerate(C.ACTION_HEAD_BITS):
        pool |= np.asarray(bits, np.int32)[md[..., h]]

    # Warmup (compiles every program incl. the refill path; remote compiles
    # through the dev-TPU tunnel take minutes, so warm thoroughly). The
    # second flush exercises a refill with a one-chunk done count, which
    # compiles the slot-padded scatter program the timed chunks will use.
    # Keep warming until the dispatch-mode trials lock in (3 median-timed
    # chunks per mode on the tunneled-TPU loop path) so no trial chunk —
    # possibly running the slower mode — lands inside the timed section.
    for _ in range(2):
        _, dones, csums = env.step_many(pool, chunk)
        jax.block_until_ready(csums[-1])
    env.flush()
    for _ in range(8):
        _, dones, csums = env.step_many(pool, chunk)
        jax.block_until_ready(csums[-1])
        env.flush()
        if env.dispatch_trials_done():
            break

    # Timing fence: fetch the checksum VALUE, not just block_until_ready —
    # on the tunneled axon platform, readiness of results whose graph
    # contains certain custom calls can resolve before execution finishes,
    # while a concrete scalar fetch cannot.
    t0 = time.perf_counter()
    for _ in range(chunks):
        _, dones, csums = env.step_many(pool, chunk)
    _ = int(csums[-1])
    dt = time.perf_counter() - t0
    env.close()

    n_obs = num_envs * num_agents * chunk * chunks
    return n_obs / dt, n_obs, dt


def emit(scenario: str, num_envs: int, fps: float, base: float) -> None:
    print(json.dumps({
        "metric": f"obs_per_sec_{scenario.lower()}_{num_envs}env",
        "value": round(fps, 1),
        "unit": "obs/s@128x72",
        "vs_baseline": round(fps / base, 3),
    }), flush=True)


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenario", default=os.environ.get("BENCH_SCENARIO", ""),
                   help="bench ONE scenario instead of the Megaverse-8 suite")
    p.add_argument("--num_envs", type=int,
                   default=int(os.environ.get("BENCH_NUM_ENVS", "4096")))
    p.add_argument("--num_agents", type=int,
                   default=int(os.environ.get("BENCH_NUM_AGENTS", "1")))
    p.add_argument("--n_devices", type=int,
                   default=int(os.environ.get("BENCH_N_DEVICES", "1")),
                   help="shard the env batch over this many devices")
    args = p.parse_args()

    if args.scenario:
        fps, _, _ = bench_scenario(
            args.scenario, num_envs=args.num_envs, num_agents=args.num_agents,
            n_devices=args.n_devices)
        base = BASELINE_FPS.get(args.scenario.lower(), BASELINE_EMPTY_FPS)
        emit(args.scenario, args.num_envs, fps, base)
        return

    # Suite mode: Empty first (the reference's headline config), then the
    # Megaverse-8 tasks; the aggregate over the 8 tasks is the FINAL line.
    try:
        fps, _, _ = bench_scenario("Empty", num_envs=args.num_envs,
                                   num_agents=args.num_agents,
                                   n_devices=args.n_devices)
        emit("Empty", args.num_envs, fps, BASELINE_FPS["empty"])
    except Exception as e:  # keep the suite going
        print(f"bench Empty failed: {e!r}", file=sys.stderr, flush=True)

    total_obs, total_dt = 0, 0.0
    for name in MEGAVERSE8:
        try:
            fps, n_obs, dt = bench_scenario(
                name, num_envs=SUITE_NUM_ENVS, num_agents=args.num_agents,
                n_devices=args.n_devices)
        except Exception as e:
            print(f"bench {name} failed: {e!r}", file=sys.stderr, flush=True)
            continue
        total_obs += n_obs
        total_dt += dt
        emit(name, SUITE_NUM_ENVS, fps,
             BASELINE_FPS.get(name.lower(), BASELINE_EMPTY_FPS))

    agg = total_obs / total_dt if total_dt else 0.0
    print(json.dumps({
        "metric": f"obs_per_sec_megaverse8_aggregate_{SUITE_NUM_ENVS}env_per_task",
        "value": round(agg, 1),
        "unit": "obs/s@128x72",
        "vs_baseline": round(agg / BASELINE_PER_CHIP_FPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
