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


def test_sumtree_batch_update_mixed_leaf_depths():
    """Regression: for non-power-of-two capacities the complete tree's leaves
    sit on two depths; a batched update whose indices straddle the boundary
    used to infinite-loop (parent index -1 self-perpetuates) and corrupt
    tree[-1].  The walk must terminate and leave every prefix sum exact."""
    from mdcommunity_tpu.rl.replay_prioritized import SumTree

    cap = 100  # leaves at tree idx 99..198; depth boundary at node 127
    t = SumTree(cap)
    rng = np.random.default_rng(0)
    pri = rng.random(cap)
    # mixed-depth batch: data_idx < 28 -> shallow leaves, >= 28 -> deep ones
    idx = np.array([0, 5, 27, 28, 40, 99])
    t.update(idx, pri[idx])
    rest = np.setdiff1d(np.arange(cap), idx)
    t.update(rest, pri[rest])
    assert np.isclose(t.total(), pri.sum())
    # internal consistency: each parent equals its children's sum
    tree = t.tree
    for i in range(cap - 1):
        assert np.isclose(tree[i], tree[2 * i + 1] + tree[2 * i + 2])
    # descend proportionality: a single-hot tree maps every value to the hot
    # leaf, on both leaf depths (the descend ORDER is tree order, not
    # data-index order, so cumulative-offset recovery is not a valid check)
    for hot in (5, 60):  # shallow-depth and deep-depth leaf
        t2 = SumTree(cap)
        p2 = np.zeros(cap)
        p2[hot] = 1.0
        t2.update(np.arange(cap), p2)
        got = t2.sample(np.array([0.1, 0.5, 0.9]))
        np.testing.assert_array_equal(got, np.full(3, hot))


def test_sumtree_large_capacity_mixed_batch_terminates():
    """The production failure shape: capacity 100_000, batch spanning the
    depth-16/17 leaf boundary (data_idx around 31_072)."""
    from mdcommunity_tpu.rl.replay_prioritized import SumTree

    t = SumTree(100_000)
    idx = np.array([0, 31_000, 31_071, 31_072, 31_073, 99_999])
    t.update(idx, np.ones(len(idx)))
    assert np.isclose(t.total(), len(idx))


def test_prioritized_sampling_respects_slots_live():
    """Stale transitions (graph slot overwritten by a later pool epoch) are
    excluded from prioritized batches and their tree mass drains to zero —
    the uniform path's slots_live contract (rl/replay.py sample)."""
    from mdcommunity_tpu.rl.replay_prioritized import PrioritizedNStepReplay

    r = PrioritizedNStepReplay(1024, 64, 1024, 5)
    cov = np.zeros(64, bool)
    sev = np.zeros((2, 1024), bool)
    # 40 episodes on graph slot 0 epoch 0 (stale) + 40 on slot 1 epoch 1
    for gid, epoch in ((0, 0), (1, 1)):
        for _ in range(40):
            T = 4
            r.add_episode(gid, [cov] * (T + 1), [sev] * (T + 1),
                          list(range(T)), [0.1] * T, graph_epoch=epoch)

    def slots_live(slots, epochs):
        return epochs >= 1  # epoch-0 slots were overwritten

    rng = np.random.default_rng(0)
    for _ in range(3):
        pb = r.sample_prioritized(rng, 32, slots_live=slots_live)
        assert (r.graph_epochs[pb.tree_idx] >= 1).all()
    # the first stale hit zeroes the ENTIRE stale set in one batched update
    stale = np.nonzero(r.graph_epochs[: r.count] == 0)[0]
    assert (r.tree.tree[stale + r.tree.capacity - 1] == 0).all()
