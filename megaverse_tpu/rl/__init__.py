from megaverse_tpu.rl.learner import TrainConfig, Learner  # noqa: F401
