"""Variant coverage: degree-cost and community-enhanced (CE) pipelines."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import networkx as nx
import pytest

from mdcommunity_tpu.utils.config import Config
from mdcommunity_tpu.rl.dqn import DQNAgent
from mdcommunity_tpu.graphs.community import duplex_prior
from mdcommunity_tpu.env.env import prune_q_to_boundary


def _cfg(variant):
    return Config(
        variant=variant,
        n_train=5, n_valid=2, max_iteration=4, batch_size=4,
        warmup_games=1, warmup_traj=3, num_env=4,
        num_min=12, num_max=16, pad_nodes=16, pad_edges=256,
        memory_size=1000, save_frequency=4, update_time=4,
    )


@pytest.mark.parametrize("variant", ["degree_cost", "ce", "hca"])
def test_variant_smoke_train(tmp_path, variant):
    agent = DQNAgent(_cfg(variant), seed=1)
    agent.train(save_dir=str(tmp_path / variant), log=lambda *a: None)
    # ran one validation and saved checkpoints
    assert (tmp_path / variant / "best_model.ckpt").exists()


def test_hca_features_and_forward(rng):
    import jax
    import networkx as nx

    from mdcommunity_tpu.graphs.hca import hca_communities_and_features
    from mdcommunity_tpu.graphs.duplex import build_duplex, stack_graphs
    from mdcommunity_tpu.env.env import env_reset_jit, hca_bridge_bonus
    from mdcommunity_tpu.models.hca import init_hca_params, make_hca_inputs, hca_forward

    n = 20
    g1 = nx.gnp_random_graph(n, 0.2, seed=7)
    g2 = nx.gnp_random_graph(n, 0.2, seed=8)
    comm_id, n_comms, feat = hca_communities_and_features(
        n, list(g1.edges()), list(g2.edges())
    )
    assert (feat[:, 0] >= 0).all() and (feat[:, 0] <= 1).all()  # f_het in [0,1]
    assert (n_comms >= 1).all()
    g = build_duplex(
        n, list(g1.edges()), list(g2.edges()), 24, 256,
        comm_id=comm_id, n_comms=n_comms, hca_feat=feat,
    )
    if int(g.max_rank) <= 1:
        pytest.skip("degenerate")
    state = env_reset_jit(g)
    gb = stack_graphs([g])
    inputs = make_hca_inputs(gb, state.covered[None], state.sever[None], c_pad=24)
    params = init_hca_params(jax.random.PRNGKey(0))
    q, h_f = hca_forward(params, gb, inputs)
    qn = np.asarray(q[0])
    active = np.asarray(inputs.active[0])
    # all uncovered real nodes have finite q (possibly -1e9); dead are -inf
    assert np.isfinite(qn[active]).all()
    assert not np.isfinite(qn[~active]).any()
    # top-community masking: at least one node scores above the -1e9 floor
    assert (qn[active] > -1e8).any()
    # bridge bonus is nonnegative and finite
    a = int(np.nonzero(active)[0][0])
    bb = float(hca_bridge_bonus(g, state, jnp.int32(a)))
    assert 0.0 <= bb <= 1.0 + 1e-6


def test_ce_param_count():
    """CE widens w_n2l to [3, 64]: +64 params over the 31205 baseline."""
    import jax
    from mdcommunity_tpu.models.net import init_params, param_count

    p = init_params(jax.random.PRNGKey(0), node_feat_dim=3)
    assert param_count(p) == 31205 + 64


def test_duplex_prior_properties(rng):
    g1 = nx.gnp_random_graph(30, 0.15, seed=0)
    g2 = nx.gnp_random_graph(30, 0.15, seed=1)
    feats, bmask = duplex_prior(30, list(g1.edges()), list(g2.edges()), "boundary")
    assert feats.shape == (2, 30)
    assert set(np.unique(feats)).issubset({0.0, 1.0})
    # boundary union covers each layer's boundary nodes
    assert bmask.sum() >= max(feats[0].sum(), feats[1].sum())
    pf, _ = duplex_prior(30, list(g1.edges()), list(g2.edges()), "participation")
    assert (pf >= 0).all() and (pf <= 1).all()


def test_prune_q_to_boundary():
    q = jnp.asarray([[1.0, 2.0, -jnp.inf, 0.5],
                     [1.0, 2.0, 3.0, -jnp.inf]])
    boundary = jnp.asarray([[True, False, True, False],
                            [False, False, False, False]])
    out = np.asarray(prune_q_to_boundary(q, boundary))
    # row 0: only node 0 is a valid boundary candidate -> others pruned
    assert np.isfinite(out[0, 0]) and not np.isfinite(out[0, 1]) and not np.isfinite(out[0, 3])
    # row 1: no boundary candidates -> untouched
    np.testing.assert_array_equal(out[1], np.asarray(q[1]))


def test_degree_cost_reward(rng):
    """Degree-cost reward scales by the removed node's normalized weight
    (reference: degree_cost/mvc_env.getReward :127-133)."""
    from mdcommunity_tpu.graphs.duplex import build_duplex
    from mdcommunity_tpu.env.env import env_reset_jit, env_step_jit

    n = 10
    g1 = nx.gnp_random_graph(n, 0.4, seed=3)
    g2 = nx.gnp_random_graph(n, 0.4, seed=4)
    w = np.zeros((2, n), np.float32)
    for l, G in enumerate((g1, g2)):
        deg = np.array([G.degree(v) for v in range(n)], np.float32)
        w[l] = deg / max(deg.max(), 1)
    g = build_duplex(n, list(g1.edges()), list(g2.edges()), 16, 256, weights=w)
    state = env_reset_jit(g)
    if bool(state.terminal):
        pytest.skip("degenerate graph")
    a = 0
    state2, r = env_step_jit(g, state, jnp.int32(a), degree_cost=True)
    rank = float(state2.rank)
    wsum = w.sum(axis=1)
    expected = -(rank / float(g.max_rank)) * 0.5 * (w[0, a] / wsum[0] + w[1, a] / wsum[1])
    assert float(r) == pytest.approx(expected, rel=1e-5)
