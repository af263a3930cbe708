from mdcommunity_tpu.rl.replay import NStepReplay, ReplayBatch  # noqa: F401
from mdcommunity_tpu.rl.dqn import DQNAgent  # noqa: F401
