"""Blocked large-graph path: slot-ordered DuplexGraph + Pallas aggregation
produce the same Q-values and dismantling behavior as the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcommunity_tpu.env.batch import make_batch_inputs
from mdcommunity_tpu.env.env import batched_reset
from mdcommunity_tpu.graphs.blocked import build_blocked_duplex
from mdcommunity_tpu.graphs.duplex import build_duplex, stack_graphs
from mdcommunity_tpu.models.net import init_params, make_blocked_aggregate
from mdcommunity_tpu.models.net import test_forward as model_forward


def _random_duplex(rng, n, m):
    e0 = rng.integers(0, n, (m, 2)).astype(np.int32)
    e1 = rng.integers(0, n, (m, 2)).astype(np.int32)
    e0 = e0[e0[:, 0] != e0[:, 1]]
    e1 = e1[e1[:, 0] != e1[:, 1]]
    e0 = np.unique(np.sort(e0, axis=1), axis=0)
    e1 = np.unique(np.sort(e1, axis=1), axis=0)
    return e0, e1


def test_blocked_q_matches_dense():
    rng = np.random.default_rng(0)
    n = 600
    e0, e1 = _random_duplex(rng, n, 1500)
    bd = build_blocked_duplex(n, e0, e1, S=512, T=512, reorder=True)
    params = init_params(jax.random.PRNGKey(0))

    gb = stack_graphs([bd.g])
    state = batched_reset(gb)
    inputs_d = make_batch_inputs(gb, state.covered, state.sever, dense=True)
    q_dense = model_forward(params, gb, inputs_d)
    inputs_s = make_batch_inputs(gb, state.covered, state.sever, dense=False)
    q_blocked = model_forward(
        params, gb, inputs_s, aggregate_fn=make_blocked_aggregate(bd)
    )
    np.testing.assert_allclose(
        np.asarray(q_blocked), np.asarray(q_dense), rtol=2e-3, atol=2e-4
    )


def test_blocked_dismantle_matches_dense():
    from mdcommunity_tpu.eval.metrics import dismantle_greedy

    rng = np.random.default_rng(1)
    n = 300
    e0, e1 = _random_duplex(rng, n, 700)
    params = init_params(jax.random.PRNGKey(1))

    bd = build_blocked_duplex(n, e0, e1, S=512, T=512, reorder=True)
    sol_b, score_b, curve_b = dismantle_greedy(params, bd, step=4, max_steps=24)

    # dense reference on the SAME node ordering (the blocked graph relabels)
    from mdcommunity_tpu.graphs.ordering import apply_order

    s0, d0 = apply_order(bd.perm, e0[:, 0], e0[:, 1])
    s1, d1 = apply_order(bd.perm, e1[:, 0], e1[:, 1])
    g = build_duplex(
        n, np.stack([s0, d0], 1), np.stack([s1, d1], 1), bd.pad_n,
        bd.g.pad_e if bd.g.pad_e % 128 == 0 else ((bd.g.pad_e // 128 + 1) * 128),
    )
    sol_d, score_d, curve_d = dismantle_greedy(params, g, step=4, max_steps=24)
    assert sol_b == sol_d
    np.testing.assert_allclose(score_b, score_d, rtol=1e-4)
