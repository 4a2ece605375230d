"""Platform introspection helpers.

The dev-TPU tunnel ("axon" PJRT plugin) masquerades as a normal `tpu`
backend (`jax.default_backend() == "tpu"`, device_kind "TPU v5 lite"), but
has very different dispatch characteristics: a Pallas call inside an XLA
loop degrades to a ~100 ms host round-trip per iteration, so fused
`lax.scan` stepping — the right default on real silicon — is
counterproductive there. Detect it from the backend registry / platform
version string rather than asking users to set env vars.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def is_tunneled_tpu() -> bool:
    """True when the 'tpu' backend is actually a tunneled dev-chip proxy."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    try:
        import jax._src.xla_bridge as xb

        if "axon" in xb.backends():
            return True
        return "axon" in xb.get_backend().platform_version.lower()
    except Exception:
        return False
