"""Device LMCC cascade vs. networkx oracle, on random duplex graphs."""

import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from mdcommunity_tpu.env.cascade import cascade_from_scratch
from mdcommunity_tpu.env.env import (env_reset_jit as env_reset, env_step_jit as env_step, valid_action_mask_jit as valid_action_mask)
from mdcommunity_tpu.graphs.duplex import build_duplex

from oracle import OracleEnv, mcc_oracle


def random_duplex(rng, n, p0=0.12, p1=0.12):
    g1 = nx.gnp_random_graph(n, p0, seed=int(rng.integers(1 << 30)))
    g2 = nx.gnp_random_graph(n, p1, seed=int(rng.integers(1 << 30)))
    return list(g1.edges()), list(g2.edges())


def to_device_graph(e0, e1, n, pad_n=48, pad_e=512):
    # fixed pads so every test shares one compiled cascade
    return build_duplex(n, e0, e1, pad_n, pad_e)


def sever_set(g, sever_mask, layer):
    s = np.asarray(g.src[layer])
    d = np.asarray(g.dst[layer])
    m = np.asarray(sever_mask[layer]) & np.asarray(g.edge_mask[layer])
    return {(min(a, b), max(a, b)) for a, b in zip(s[m], d[m])}


@pytest.mark.parametrize("n", [8, 20, 40])
def test_intact_cascade_matches_oracle(rng, n):
    for _ in range(10):
        e0, e1 = random_duplex(rng, n)
        g = to_device_graph(e0, e1, n)
        res = cascade_from_scratch(g, jnp.zeros(g.pad_n, bool))
        g1 = nx.Graph(); g1.add_nodes_from(range(n)); g1.add_edges_from(e0)
        g2 = nx.Graph(); g2.add_nodes_from(range(n)); g2.add_edges_from(e1)
        rank, s1, s2, _ = mcc_oracle(g1, g2)
        assert int(res.rank) == rank
        assert sever_set(g, np.asarray(res.sever), 0) == s1
        assert sever_set(g, np.asarray(res.sever), 1) == s2


def test_cascade_with_covered_nodes(rng):
    n = 30
    for _ in range(8):
        e0, e1 = random_duplex(rng, n)
        g = to_device_graph(e0, e1, n)
        covered_ids = rng.choice(n, size=rng.integers(1, n // 2), replace=False)
        covered = np.zeros(g.pad_n, bool)
        covered[covered_ids] = True
        res = cascade_from_scratch(g, jnp.asarray(covered))

        cov = set(map(int, covered_ids))
        g1 = nx.Graph(); g2 = nx.Graph()
        alive = [v for v in range(n) if v not in cov]
        g1.add_nodes_from(alive); g2.add_nodes_from(alive)
        g1.add_edges_from((u, v) for u, v in e0 if u not in cov and v not in cov)
        g2.add_edges_from((u, v) for u, v in e1 if u not in cov and v not in cov)
        rank, _, _, _ = mcc_oracle(g1, g2)
        assert int(res.rank) == rank


def test_incremental_vs_scratch_live_sets(rng):
    """Live edges / rank are a pure function of the covered set; severed masks
    agree exactly on edges whose endpoints are both uncovered (cascade.py
    docstring).  The incremental record may additionally contain severed edges
    whose endpoint was covered later."""
    n = 24
    for _ in range(5):
        e0, e1 = random_duplex(rng, n)
        g = to_device_graph(e0, e1, n)
        state = env_reset(g)
        order = rng.permutation(n)
        for a in order[: n // 2]:
            if bool(state.terminal):
                break
            if not bool(state.covered[a]):
                state, _ = env_step(g, state, jnp.int32(a))
                scratch = cascade_from_scratch(g, state.covered)
                cov = np.asarray(state.covered)
                src = np.asarray(g.src); dst = np.asarray(g.dst)
                uncovered_ep = ~cov[src] & ~cov[dst]
                em = np.asarray(g.edge_mask)
                inc = np.asarray(state.sever) & em
                scr = np.asarray(scratch.sever) & em
                # exact match restricted to uncovered-endpoint edges
                np.testing.assert_array_equal(inc & uncovered_ep, scr & uncovered_ep)
                # scratch never severs covered-endpoint edges
                assert not np.any(scr & ~uncovered_ep)
                # incremental is a superset
                assert not np.any(scr & ~inc)
                assert int(scratch.rank) == int(state.rank)


def test_env_episode_matches_oracle(rng):
    n = 20
    for trial in range(5):
        e0, e1 = random_duplex(rng, n, 0.15, 0.15)
        g = to_device_graph(e0, e1, n)
        oracle = OracleEnv(e0, e1, n)
        assert int(g.max_rank) == oracle.max_rank
        state = env_reset(g)
        assert bool(state.terminal) == oracle.terminal()
        steps = 0
        while not bool(state.terminal) and steps < n:
            acts = oracle.valid_actions()
            mask = np.asarray(valid_action_mask(g, state))
            assert sorted(np.nonzero(mask)[0].tolist()) == acts
            a = int(rng.choice(acts))
            state, r = env_step(g, state, jnp.int32(a))
            r_o = oracle.step(a)
            assert abs(float(r) - r_o) < 1e-6
            assert bool(state.terminal) == oracle.terminal()
            steps += 1
        assert abs(float(state.score) - oracle.score) < 1e-5


def test_empty_layer_terminal():
    # one layer with no edges -> terminal at reset
    g = to_device_graph([(0, 1)], [], 4)
    state = env_reset(g)
    assert bool(state.terminal)
