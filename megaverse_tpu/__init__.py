"""megaverse_tpu: a TPU-native high-throughput 3D simulation + batched
rendering engine for RL research, with the capabilities of
alex-petrenko/megaverse re-designed for JAX/XLA/Pallas on TPU.

- Worlds step in lockstep inside a single jitted, vmapped pure function
  (replacing the reference's CPU thread pool + Bullet physics).
- All agent views render in one batched analytic raycast (replacing the
  batched Vulkan/OpenGL draw); observations stay in device HBM.
- Scale-out is `jax.sharding` over a device mesh, not processes.
"""

__version__ = "0.1.0"

from megaverse_tpu.vector_env import VectorEnv  # noqa: F401
from megaverse_tpu.scenarios import make_scenario, registered_scenarios  # noqa: F401
