from megaverse_tpu.models.actor_critic import ActorCritic, ConvEncoder  # noqa: F401
