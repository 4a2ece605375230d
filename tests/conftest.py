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

import jax  # noqa: E402

from megaverse_tpu.utils.cache import enable_compile_cache  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache across test runs. Env-var config does not work
# here (sitecustomize imports jax before conftest runs), so use jax.config.
enable_compile_cache()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
    config.addinivalue_line(
        "markers",
        "render_heavy: CPU/interpret-mode render tests dominating suite "
        "wall-time (fast tier: -m 'not slow and not render_heavy')")
