"""HCA-Dismantler numerical parity vs the reference network and its committed
HCA checkpoint.

Checkpoint forensics (why the SMOKE checkpoint is used): every state_dict in
the reference's non-SMOKE HCA model dirs
(HCA-Dismantler/models/g0-1_10w_TORCH-Model_GMM_30_50/*.ckpt and g0.5_*/) is a
BASE-architecture checkpoint — 14 keys, w_n2l [2, 64], no
w_macro/w_comm_score/w_micro_score — which the HCA net cannot load
(its w_n2l is [3, 64], net :42-44, and it defines three extra heads
:92-108).  Those dirs (and their ModelVC curves, min 0.1124) are inherited
from the base variant, not produced by the committed HCA code.  The ONLY
genuine HCA-architecture checkpoints in the capsule are under
models/g0-1_10w_TORCH-Model_GMM_30_50_SMOKE/ (17 keys, w_n2l [3, 64]); its
ModelVC curve reads 0.3498-0.3615 — the same quality band as our trained HCA
(0.4104 on the 200-graph pool / 0.3934 on the 32-graph golden pool), which is
the diagnosis for round 1's "unexplained" HCA VC: the HCA architecture itself
(top-30% community masking decoder) performs at ~0.35-0.41, per the
reference's own committed evidence.

Parity method: the committed SMOKE checkpoint is loaded into BOTH nets; the
reference side runs its own env + PrepareBatchGraph + net via
tests/reference_harness.py (cdlib shimmed to the same seeded Louvain our
builder uses); our side runs hca_forward in replicate-reference-bugs mode on
operators built to the reference's ACTUAL (buggy) semantics:

  * Degenerate membership (PrepareBatchGraph.py:178-200): communities are
    populated BEFORE sequential indices exist, when idx_map holds the
    presence marker 0 for every uncovered node (:53-57), so every member of
    every community collapses onto sequential node 0; additionally the
    base-variant loop (:227-232) adds ALL active nodes to subgraph row 0.
    Effective subgsum: row 0 = all active nodes (f_roi+1e-6 weights) plus
    |c0∩active| duplicates of node 0; row c>0 = |c∩active| copies of node 0.
  * Degenerate community adjacency (comm_adj_construct :491-541): node2comm
    is rebuilt from those head lists, mapping sequential node 0 to the last
    community with uncovered members and everything else to community 0, so
    the coarse graph collapses to self-loops plus (at most) one edge pair.
  * Layer-gate padding quirk (net :283-295): see hca_forward(ref_quirks=True).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
from mdcommunity_tpu.models.hca import HcaInputs, hca_forward
from mdcommunity_tpu.models.torch_convert import load_torch_checkpoint

from tests.reference_harness import (
    HCA_DIR,
    HCA_SMOKE_CKPT,
    build_reference_hca_net,
    install_fake_cdlib,
    load_reference_modules,
    reference_predict_hca,
)


def _nx_pair(n, seed):
    import networkx as nx

    rng = np.random.default_rng(seed)
    e0, e1 = gmm_duplex_edges(n, rng)
    gs = []
    for edges in (e0, e1):
        G = nx.Graph()
        G.add_nodes_from(range(n))
        G.add_edges_from(int(u) for u in ())  # keep nx quiet on empty iterables
        G.add_edges_from((int(u), int(v)) for u, v in edges)
        gs.append(G)
    return gs[0], gs[1]


def _degenerate_inputs(nx_g1, nx_g2, covered, remove_edge, comms, feat):
    """Build HcaInputs implementing the reference's ACTUAL batch-assembly
    semantics (see module docstring) for a single graph, in original node-id
    space (sequential index k = k-th smallest active id)."""
    n = nx_g1.number_of_nodes()
    cov = np.zeros(n, bool)
    cov[list(covered)] = True
    active = ~cov
    act_ids = np.flatnonzero(active)
    assert len(act_ids) > 0
    first = int(act_ids[0])  # sequential node 0

    C = [len(comms[0]), len(comms[1])]
    c_pad = max(C)  # == the reference net's max_comm_size

    adj = np.zeros((2, n, n), np.float32)
    member = np.zeros((2, c_pad, n), np.float32)
    comm_adj = np.zeros((2, c_pad, c_pad), np.float32)
    comm_real = np.zeros((2, c_pad), bool)
    froi = feat[:, 2].astype(np.float64)
    froi0 = froi[first] + 1e-6

    for j, G in enumerate((nx_g1, nx_g2)):
        live = [
            (u, v) for (u, v) in G.edges()
            if tuple((u, v)) not in remove_edge[j]
            and active[u] and active[v]
        ]
        for u, v in live:
            adj[j, u, v] += 1.0
            adj[j, v, u] += 1.0

        mult = np.array(
            [sum(1 for u in comms[j][c] if active[u]) for c in range(C[j])]
        )
        # degenerate membership: every member -> sequential node 0
        for c in range(C[j]):
            member[j, c, first] += mult[c] * froi0
        # base-variant virtual-node loop: all active nodes into row 0
        for u in act_ids:
            member[j, 0, u] += froi[u] + 1e-6

        # degenerate comm_adj: node2comm[seq 0] = last community with
        # uncovered members (rows iterated ascending), all others -> 0
        nonzero = [c for c in range(C[j]) if mult[c] > 0]
        cmax = max(nonzero) if nonzero else 0
        deg_first = sum(1 for (u, v) in live if u == first or v == first)
        if cmax != 0 and deg_first > 0:
            comm_adj[j, 0, cmax] = 1.0
            comm_adj[j, cmax, 0] = 1.0
        comm_adj[j, range(C[j]), range(C[j])] = 1.0
        comm_real[j, : C[j]] = True

    node_input = np.where(active[:, None], feat, 0.0).astype(np.float32)
    return HcaInputs(
        adj=jnp.asarray(adj[None]),
        member=jnp.asarray(member[None]),
        comm_adj=jnp.asarray(comm_adj[None]),
        comm_real=jnp.asarray(comm_real[None]),
        active=jnp.asarray(active[None]),
        node_input=jnp.asarray(node_input[None]),
        deg=jnp.zeros((1, 2, n)),
        n_dir_live=jnp.zeros((1, 2)),
    )


@pytest.fixture(scope="module")
def ref():
    install_fake_cdlib(seed=0)
    ns = load_reference_modules(HCA_DIR)
    net = build_reference_hca_net(ns)
    import torch

    net.load_state_dict(torch.load(HCA_SMOKE_CKPT, map_location="cpu",
                                   weights_only=True))
    return ns, net


@pytest.mark.parametrize("seed,n_cover", [(1, 0), (2, 0), (1, 4), (3, 7)])
def test_hca_q_parity_vs_reference_ckpt(ref, seed, n_cover):
    ns, net = ref
    n = 36
    nx_g1, nx_g2 = _nx_pair(n, seed)

    # choose removals the way the reference env would accept them (uncovered)
    rngc = np.random.default_rng(100 + seed)
    covered = list(rngc.choice(n, size=n_cover, replace=False)) if n_cover else []

    q_ref, feat_ref, comms, remove_edge = reference_predict_hca(
        ns, net, nx_g1, nx_g2, covered
    )

    params = load_torch_checkpoint(HCA_SMOKE_CKPT)
    assert params["w_n2l"].shape == (3, 64) and "w_macro" in params

    inputs = _degenerate_inputs(
        nx_g1, nx_g2, covered, remove_edge, comms, feat_ref
    )
    q_ours, _ = hca_forward(params, None, inputs, ref_quirks=True)
    q_ours = np.asarray(q_ours[0])

    alive = np.isfinite(q_ref)
    assert alive.any()
    assert np.array_equal(alive, np.isfinite(q_ours))
    # -1e9 rows (decoder-unselected) must agree exactly as a set
    sel_ref = q_ref[alive] > -1e8
    sel_ours = q_ours[alive] > -1e8
    assert np.array_equal(sel_ref, sel_ours)
    np.testing.assert_allclose(
        q_ours[alive][sel_ours], q_ref[alive][sel_ref], rtol=2e-4, atol=2e-5
    )


def test_hca_q_parity_dense_graph_full_selection(ref):
    """A dense duplex where community 0 wins the top-30% mask in both layers,
    so EVERY active node's Q survives the decoder mask — a rich elementwise
    value comparison (the GMM cases above typically select a single node;
    see the degenerate-membership analysis in the module docstring)."""
    import networkx as nx

    ns, net = ref
    n = 18
    nx_g1 = nx.gnp_random_graph(n, 0.45, seed=13)
    nx_g2 = nx.gnp_random_graph(n, 0.45, seed=63)
    q_ref, feat_ref, comms, remove_edge = reference_predict_hca(
        ns, net, nx_g1, nx_g2, []
    )
    params = load_torch_checkpoint(HCA_SMOKE_CKPT)
    inputs = _degenerate_inputs(nx_g1, nx_g2, [], remove_edge, comms, feat_ref)
    q_ours = np.asarray(hca_forward(params, None, inputs, ref_quirks=True)[0][0])
    alive = np.isfinite(q_ref)
    sel = q_ref[alive] > -1e8
    assert sel.sum() >= 10  # rich comparison, not a single survivor
    assert np.asarray(q_ref[alive][sel]).std() > 0.1
    assert np.array_equal(sel, q_ours[alive] > -1e8)
    np.testing.assert_allclose(
        q_ours[alive][sel], q_ref[alive][sel], rtol=2e-4, atol=2e-5
    )


def test_hca_features_and_communities_match_reference(ref):
    """Our static builder (graphs/hca.py) computes the same communities and
    [f_het, f_impact, f_roi] features as the reference env's
    calculate_hca_features (mvc_env.py:39-136) on the same graph."""
    from mdcommunity_tpu.graphs.hca import hca_communities_and_features

    ns, net = ref
    n = 40
    nx_g1, nx_g2 = _nx_pair(n, seed=5)
    _, feat_ref, comms_ref, _ = reference_predict_hca(ns, net, nx_g1, nx_g2, [])

    e0 = np.asarray(list(nx_g1.edges()), np.int32).reshape(-1, 2)
    e1 = np.asarray(list(nx_g2.edges()), np.int32).reshape(-1, 2)
    comm_id, n_comms, feat = hca_communities_and_features(n, e0, e1, seed=0)

    np.testing.assert_allclose(feat, feat_ref, rtol=1e-6, atol=1e-8)
    for j in range(2):
        ours = {frozenset(np.flatnonzero(comm_id[j] == c))
                for c in range(int(n_comms[j]))}
        theirs = {frozenset(c) for c in comms_ref[j]}
        assert ours == theirs
