"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite exercises the multi-chip sharding path without TPU hardware.

Note: this container's sitecustomize force-registers a tunneled TPU platform
("axon") that overrides JAX_PLATFORMS env selection; jax.config.update is the
reliable way to pin the CPU backend for tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/megaverse_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
