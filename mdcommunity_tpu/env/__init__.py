from mdcommunity_tpu.env.cascade import cascade, connected_components, intact_max_rank  # noqa: F401
from mdcommunity_tpu.env.env import EnvState, env_reset, env_step, is_terminal  # noqa: F401
