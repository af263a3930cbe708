"""Prioritized replay: sum-tree invariants and sampling bias."""

import numpy as np
import pytest

from mdcommunity_tpu.rl.replay_prioritized import PrioritizedNStepReplay, SumTree


def test_sumtree_invariants():
    t = SumTree(16)
    rng = np.random.default_rng(0)
    pri = rng.random(16)
    t.update(np.arange(16), pri)
    assert t.total() == pytest.approx(pri.sum())
    # every sampled value maps to a leaf whose cumulative range covers it
    vals = rng.random(64) * t.total()
    idx = t.sample(vals)
    assert ((idx >= 0) & (idx < 16)).all()
    # high-priority leaves get sampled more
    t.update(np.arange(16), np.full(16, 1e-6))
    t.update(np.asarray([5]), np.asarray([100.0]))
    idx = t.sample(rng.random(200) * t.total())
    assert (idx == 5).mean() > 0.95


def test_prioritized_replay_cycle():
    rep = PrioritizedNStepReplay(64, pad_nodes=8, pad_edges=16, n_step=2)
    T = 5
    covered = [np.zeros(8, bool)]
    for i in range(T):
        c = covered[-1].copy(); c[i] = True
        covered.append(c)
    sever = [np.zeros((2, 16), bool) for _ in range(T + 1)]
    rep.add_episode(0, covered, sever, list(range(T)), [-1.0] * T)
    rng = np.random.default_rng(0)
    pb = rep.sample_prioritized(rng, 4)
    assert pb.batch.covered_st.shape == (4, 8)
    assert (pb.is_weights > 0).all() and (pb.is_weights <= 1.0 + 1e-6).all()
    rep.update_priorities(pb.tree_idx, np.asarray([0.5, 0.1, 0.9, 0.0]))
    # beta anneals toward 1
    b0 = rep.beta
    rep.sample_prioritized(rng, 4)
    assert rep.beta >= b0
