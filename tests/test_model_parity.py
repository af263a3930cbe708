"""Numerical parity: our batched/masked model vs the actual reference network
(imported from the read-only capsule, with a reference checkpoint loaded into
both).  This is the `allclose` requirement of BASELINE.md."""

import glob

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from mdcommunity_tpu.env.batch import make_batch_inputs
from mdcommunity_tpu.env.env import env_reset_jit, env_step_jit
from mdcommunity_tpu.graphs.duplex import build_duplex, stack_graphs
from mdcommunity_tpu.models.net import test_forward as model_test_forward
from mdcommunity_tpu.models.net import param_count, init_params
from mdcommunity_tpu.models.torch_convert import load_torch_checkpoint, params_to_state_dict

from reference_harness import build_reference_net, load_reference_modules

CKPTS = sorted(
    glob.glob(
        "/root/reference/code/MultiDismantler_unit_cost/models/"
        "g0-1_10w_TORCH-Model_GMM_30_50/best_model.ckpt"
    )
)


@pytest.fixture(scope="module")
def refspace():
    return load_reference_modules()


def _random_duplex_nx(rng, n, p=0.15):
    g1 = nx.gnp_random_graph(n, p, seed=int(rng.integers(1 << 30)))
    g2 = nx.gnp_random_graph(n, p, seed=int(rng.integers(1 << 30)))
    return g1, g2


def _our_q(params, g1, g2, covered, n):
    g = build_duplex(n, list(g1.edges()), list(g2.edges()), 48, 512)
    state = env_reset_jit(g)
    for a in covered:
        state, _ = env_step_jit(g, state, jnp.int32(a))
    gb = stack_graphs([g])
    inputs = make_batch_inputs(
        gb, state.covered[None], state.sever[None], dense=True
    )
    q = model_test_forward(params, gb, inputs)
    return np.asarray(q[0][: n]), inputs


def test_param_count_matches_reference():
    import jax

    p = init_params(jax.random.PRNGKey(0))
    assert param_count(p) == 31205  # reference log: CEMultiDismantler/log.txt:4


@pytest.mark.skipif(not CKPTS, reason="no reference checkpoint available")
def test_qvalues_match_reference_net(refspace, rng):
    params = load_torch_checkpoint(CKPTS[0])
    net = build_reference_net(refspace)
    import torch

    net.load_state_dict(torch.load(CKPTS[0], map_location="cpu", weights_only=True))
    net.eval()

    trials = 0
    while trials < 3:
        n = int(rng.integers(12, 30))
        g1, g2 = _random_duplex_nx(rng, n)
        from oracle import OracleEnv as _OE

        if _OE(list(g1.edges()), list(g2.edges()), n).terminal():
            continue  # dead at reset: the reference never predicts on these
        trials += 1
        ref_q, ref_aux, _ = refspace_predict(refspace, net, g1, g2, [])
        ours, inputs = _our_q(params, g1, g2, [], n)
        _compare(ref_q, ours, ref_aux, inputs, n)

        # a mid-episode state: remove a few valid nodes
        from oracle import OracleEnv

        oe = OracleEnv(list(g1.edges()), list(g2.edges()), n)
        covered = []
        for _ in range(min(4, n // 4)):
            acts = oe.valid_actions()
            if not acts or oe.terminal():
                break
            a = int(rng.choice(acts))
            oe.step(a)
            covered.append(a)
        if covered and not oe.terminal() and oe.valid_actions():
            ref_q, ref_aux, _ = refspace_predict(refspace, net, g1, g2, covered)
            ours, inputs = _our_q(params, g1, g2, covered, n)
            _compare(ref_q, ours, ref_aux, inputs, n)


def refspace_predict(refspace, net, g1, g2, covered):
    from reference_harness import reference_predict

    return reference_predict(refspace, net, g1, g2, covered)


def _compare(ref_q, ours, ref_aux, inputs, n):
    np.testing.assert_allclose(
        np.asarray(inputs.aux[0]), ref_aux[0], rtol=1e-5, atol=1e-6
    )
    finite = np.isfinite(ref_q)
    assert (finite == np.isfinite(ours)).all()
    np.testing.assert_allclose(ours[finite], ref_q[finite], rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(not CKPTS, reason="no reference checkpoint available")
def test_state_dict_round_trip():
    params = load_torch_checkpoint(CKPTS[0])
    sd = params_to_state_dict(params)
    params2 = load_torch_checkpoint.__wrapped__(sd) if hasattr(
        load_torch_checkpoint, "__wrapped__"
    ) else None
    from mdcommunity_tpu.models.torch_convert import state_dict_to_params

    params2 = state_dict_to_params(sd)
    for k in ["w_n2l", "cross_product"]:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(params2[k]))


def test_training_loss_matches_reference(refspace, rng):
    """train_forward Q(s,a) + Laplacian reconstruction term vs the reference
    calc_loss composition (:410-431) on one fixed state/action batch."""
    import networkx as nx
    import torch

    from mdcommunity_tpu.env.batch import make_batch_inputs
    from mdcommunity_tpu.graphs.duplex import build_duplex, stack_graphs
    from mdcommunity_tpu.models.net import (
        init_params,
        laplacian_regularizer,
        train_forward,
    )
    from mdcommunity_tpu.models.torch_convert import params_to_state_dict
    from reference_harness import build_reference_net

    ns = refspace
    net = build_reference_net(ns)
    params = init_params(jax.random.PRNGKey(11))
    net.load_state_dict(params_to_state_dict(params))
    net.eval()

    n = 20
    g1 = nx.gnp_random_graph(n, 0.2, seed=5)
    g2 = nx.gnp_random_graph(n, 0.2, seed=6)
    gref = ns.graph.Graph_test(g1.copy(), g2.copy())
    action = 3

    pbg = ns.PrepareBatchGraph.PrepareBatchGraph(0)
    pbg.SetupTrain([0], [gref], [[]], [action], [[set(), set()]])
    with torch.no_grad():
        q_pred, cml = net.train_forward(
            node_input=None,
            subgsum_param=pbg.subgsum_param,
            n2nsum_param=pbg.n2nsum_param,
            action_select=pbg.act_select,
            aux_input=torch.tensor(np.array(pbg.aux_feat), dtype=torch.float32),
            adj=pbg.adj,
            v_adj=pbg.virtual_adj,
        )
        recon_ref = 0.0
        import torch_sparse as tsp

        for l in range(2):
            lp = pbg.laplacian_param[l]
            lh = tsp.spmm(lp["index"], lp["value"], lp["m"], lp["n"], cml[l])
            tr = 2 * torch.trace(cml[l].T @ lh)
            edge_num = float(torch.sum(torch.as_tensor(
                pbg.n2nsum_param[l]["value"])))
            recon_ref += float(tr) / edge_num

    g = build_duplex(n, list(g1.edges()), list(g2.edges()), 32, 256)
    gb = stack_graphs([g])
    covered = jnp.zeros((1, 32), bool)
    sever = jnp.zeros((1, 2, 256), bool)
    inputs = make_batch_inputs(gb, covered, sever, dense=True)
    q_ours, h_f = train_forward(params, gb, inputs, jnp.asarray([action]))
    recon_ours = float(laplacian_regularizer(h_f, gb, inputs))

    np.testing.assert_allclose(float(q_ours[0]), float(q_pred[0, 0]), rtol=2e-4)
    np.testing.assert_allclose(recon_ours, recon_ref, rtol=2e-3, atol=1e-5)
