from megaverse_tpu.parallel.mesh import make_mesh, ParallelLearner  # noqa: F401
from megaverse_tpu.parallel.distributed import (  # noqa: F401
    data_mesh,
    env_batch_sharding,
    maybe_initialize_distributed,
)
