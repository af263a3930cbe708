import sys, dataclasses, time
import jax
jax.config.update("jax_platforms", "cpu")
from mdcommunity_tpu.rl.dqn import DQNAgent
from mdcommunity_tpu.utils.config import Config

mode = sys.argv[1]  # "prio" | "uniform"
cfg = dataclasses.replace(
    Config(variant="unit_cost"),
    use_prioritized=(mode == "prio"),
    max_iteration=5000,
)
agent = DQNAgent(cfg)
t0 = time.time()
agent.train(save_dir=f"./models_tpu/unit_cost_{mode}5k_r2")
print(f"{mode} done in {time.time()-t0:.0f}s")
