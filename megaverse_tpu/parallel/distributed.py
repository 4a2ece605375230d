"""Multi-host (multi-process) initialization and mesh construction.

The reference scales across machines with slurm-launched Sample Factory
processes communicating through the filesystem (SURVEY 2.3,
megaverse_rl/slurm/sbatch_template.sh). The TPU-native equivalent is JAX
multi-process SPMD: one process per host, `jax.distributed.initialize` wires
them into one runtime, and every jitted computation then sees the global
device set — env shards stay chip-local, gradient pmean rides ICI within a
slice and DCN across hosts.

Entry is env-var gated so single-host use needs nothing:

- `MEGAVERSE_DIST=1` — initialize with JAX's automatic cluster detection
  (TPU pods / GKE / slurm set the coordinator variables themselves), or
- `MEGAVERSE_COORDINATOR=host:port` + `MEGAVERSE_NUM_PROCESSES` +
  `MEGAVERSE_PROCESS_ID` — explicit wiring for bare-metal launches.

Every CLI (bench.py, rl/train.py) calls `maybe_initialize_distributed()`
before touching jax devices.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when env vars request it. Idempotent.
    Returns True when running multi-process."""
    global _initialized
    if _initialized:
        return True
    import jax

    coord = os.environ.get("MEGAVERSE_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["MEGAVERSE_NUM_PROCESSES"]),
            process_id=int(os.environ["MEGAVERSE_PROCESS_ID"]),
        )
        _initialized = True
        return True
    if os.environ.get("MEGAVERSE_DIST"):
        # Automatic detection: TPU pod metadata / cluster env vars.
        jax.distributed.initialize()
        _initialized = True
        return True
    return False


def data_mesh(n_devices: Optional[int] = None):
    """1-D `data` mesh over the global device list (all processes' chips).

    On a multi-host slice, jax.devices() already spans every host after
    initialize(); sharding the env batch over it gives cross-host data
    parallelism with zero code changes elsewhere."""
    from megaverse_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices)


def env_batch_sharding(mesh=None):
    """NamedSharding placing the leading env-batch axis over the data mesh —
    pass as VectorEnv(device=...)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        mesh = data_mesh()
    return NamedSharding(mesh, P("data"))
