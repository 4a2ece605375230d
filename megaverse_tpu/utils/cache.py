"""Persistent-compilation-cache setup.

Environment-variable configuration (JAX_COMPILATION_CACHE_DIR) does not work
in this container: the axon sitecustomize imports jax at interpreter start,
before user code can set the variable, so jax snapshots the env without it.
`jax.config.update` works at any point before the first compilation.
"""

from __future__ import annotations

DEFAULT_CACHE_DIR = "/tmp/megaverse_tpu_jax_cache"


def enable_compile_cache(path: str = DEFAULT_CACHE_DIR,
                         min_compile_secs: float = 1.0) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
