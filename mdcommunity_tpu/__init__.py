"""mdcommunity_tpu: a TPU-native framework for learning to dismantle interdependent
(duplex / multiplex) networks.

Re-designed from scratch for JAX/XLA/Pallas on TPU, with the capability surface of
the MultiDismantler reference family (unit-cost, degree-cost, community-enhanced,
hierarchical-community-aware): a GraphSAGE-style duplex GNN with cross-layer fusion,
a DQN agent, a batched on-device LMCC dismantling environment, and heuristic
baselines — everything under jit with static shapes and mask-based state.

Layout:
  graphs/    duplex graph containers (padded, jit-able), GMM generator, IO, priors
  env/       LMCC cascade kernel + batched dismantling MDP
  ops/       aggregation kernels (dense MXU path, sparse segment path, Pallas SpMM)
  models/    the Q-network family + torch-checkpoint converter
  rl/        n-step replay + DQN trainer
  eval/      metrics (AUDC / LMCC curves), result writers, heuristic baselines
  parallel/  device meshes, sharded training step, edge-partitioned aggregation
  utils/     config system, logging/profiling helpers
"""

__version__ = "0.1.0"

from mdcommunity_tpu.utils.config import Config  # noqa: F401
