"""Data-parallel scaling curve over a device mesh.

Runs the Empty-scenario sampling benchmark at a fixed TOTAL env count while
sharding the batch over 1..N devices, and reports throughput + efficiency.
On real multi-chip hardware this measures ICI/SPMD scaling; on the virtual
CPU mesh (default in this container: XLA_FLAGS=--xla_force_host_platform_
device_count=8) it validates the SPMD path and measures partitioning
overhead (all "devices" share the same host cores, so ideal scaling is flat
throughput, not linear — efficiency is reported against the 1-device run).

Usage: python scripts/scaling_curve.py [--cpu] [--scenario Empty]
       [--num_envs 2048] [--devices 1,2,4,8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (virtual 8-device mesh)")
    p.add_argument("--scenario", default="Empty")
    p.add_argument("--num_envs", type=int, default=2048)
    p.add_argument("--devices", default="1,2,4,8")
    p.add_argument("--chunk", type=int, default=32)
    p.add_argument("--chunks", type=int, default=3)
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bench

    rows = []
    base = None
    for n in [int(x) for x in args.devices.split(",")]:
        fps, _, _ = bench.bench_scenario(
            args.scenario, num_envs=args.num_envs, num_agents=1,
            chunk=args.chunk, chunks=args.chunks, n_devices=n)
        if base is None:
            base = fps
        rows.append({"n_devices": n, "obs_per_sec": round(fps, 1),
                     "vs_1dev": round(fps / base, 3)})
        print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
