from megaverse_tpu.parallel.mesh import make_mesh, ParallelLearner  # noqa: F401
