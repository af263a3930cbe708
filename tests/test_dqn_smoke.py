"""End-to-end smoke: tiny DQN training run exercising the full pipeline
(generate -> rollout -> replay -> fit -> validate -> checkpoint -> resume).
Mirrors the reference's SMOKE_TEST mode (MultiDismantler_torch.py:127-143)."""

import dataclasses
import os

import numpy as np
import pytest

from mdcommunity_tpu.utils.config import Config
from mdcommunity_tpu.rl.dqn import DQNAgent


@pytest.fixture
def smoke_cfg():
    return Config(
        n_train=6,
        n_valid=3,
        max_iteration=12,
        batch_size=4,
        warmup_games=1,
        warmup_traj=4,
        num_env=4,
        num_min=12,
        num_max=16,
        pad_nodes=16,
        pad_edges=256,
        memory_size=2000,
        save_frequency=6,
        update_time=6,
    )


def test_smoke_train(tmp_path, smoke_cfg):
    agent = DQNAgent(smoke_cfg, seed=0)
    save_dir = str(tmp_path / "models")
    agent.train(save_dir=save_dir, log=lambda *a, **k: None)
    assert os.path.isfile(os.path.join(save_dir, "latest.ckpt"))
    assert os.path.isfile(os.path.join(save_dir, "best_model.ckpt"))
    vc = open(os.path.join(save_dir, f"ModelVC_12_16.csv")).read().strip().split()
    assert len(vc) == 2  # validations at iters 0 and 6
    for v in vc:
        assert 0.0 < float(v) < 3.0

    # resume restores iteration and RNG state
    agent2 = DQNAgent(smoke_cfg, seed=0)
    agent2.load(os.path.join(save_dir, "latest.ckpt"))
    assert agent2.iteration == smoke_cfg.max_iteration


def test_replay_nstep_semantics():
    """n-step returns match the reference's suffix-sum logic."""
    from mdcommunity_tpu.rl.replay import NStepReplay

    rep = NStepReplay(100, pad_nodes=8, pad_edges=16, n_step=2)
    T = 4
    covered = [np.zeros(8, bool) for _ in range(T + 1)]
    sever = [np.zeros((2, 16), bool) for _ in range(T + 1)]
    for i in range(T):
        covered[i + 1] = covered[i].copy()
        covered[i + 1][i] = True
    rewards = [-1.0, -2.0, -3.0, -4.0]
    rep.add_episode(0, covered, sever, [0, 1, 2, 3], rewards)
    assert rep.count == T
    # i=0: r0+r1 = -3, s' = covered[2], not terminal
    assert rep.rewards[0] == pytest.approx(-3.0)
    assert not rep.terminal[0]
    # i=2: i+n=4 >= T -> terminal, r = r2+r3 = -7
    assert rep.rewards[2] == pytest.approx(-7.0)
    assert rep.terminal[2]
    # i=3: terminal, r = -4
    assert rep.rewards[3] == pytest.approx(-4.0)
    assert rep.terminal[3]
    # unpacking round-trips
    rng = np.random.default_rng(0)
    batch = rep.sample(rng, 4)
    assert batch.covered_st.shape == (4, 8)
    assert batch.sever_st.shape == (4, 2, 16)


def test_smoke_train_prioritized(tmp_path, smoke_cfg):
    """Full pipeline with prioritized sampling ON: sum-tree adds, staleness-
    filtered sampling, IS-weighted fit, and the deferred (write-generation-
    guarded) priority updates all run inside the real train loop."""
    cfg = dataclasses.replace(smoke_cfg, use_prioritized=True)
    agent = DQNAgent(cfg, seed=0)
    save_dir = str(tmp_path / "models_prio")
    agent.train(save_dir=save_dir, log=lambda *a, **k: None)
    assert os.path.isfile(os.path.join(save_dir, "latest.ckpt"))
    # priorities actually moved off the max-priority init
    leaves = agent.replay.tree.tree[agent.replay.tree.capacity - 1:]
    used = leaves[: agent.replay.count]
    assert (used > 0).all()
    assert np.unique(np.round(used, 6)).size > 1
