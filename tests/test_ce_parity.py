"""CE variant: our Q-values vs the reference CE network with a TRAINED
committed checkpoint loaded into both (w_n2l [3,64] incl. fusion/gate)."""

import glob

import jax.numpy as jnp
import networkx as nx
import numpy as np
import pytest

from mdcommunity_tpu.env.batch import make_batch_inputs
from mdcommunity_tpu.graphs.duplex import build_duplex, stack_graphs
from mdcommunity_tpu.models.net import test_forward as model_test_forward
from mdcommunity_tpu.models.torch_convert import load_torch_checkpoint

from reference_harness import (
    CE_DIR,
    build_reference_net,
    load_reference_modules,
    reference_predict_ce,
)

CKPT = sorted(
    glob.glob(CE_DIR + "/models/g0-1_10w_TORCH-Model_GMM_30_50/best_model.ckpt")
)


@pytest.mark.skipif(not CKPT, reason="no committed CE checkpoint")
def test_ce_qvalues_match_reference(rng):
    import torch

    ns = load_reference_modules(CE_DIR)
    net = build_reference_net(ns)
    sd = torch.load(CKPT[0], map_location="cpu", weights_only=True)
    net.load_state_dict(sd)
    params = load_torch_checkpoint(CKPT[0])

    n = 24
    g1 = nx.gnp_random_graph(n, 0.18, seed=3)
    g2 = nx.gnp_random_graph(n, 0.18, seed=4)
    prior = rng.random((2, n)).astype(np.float32)

    for covered in ([], [2, 7]):
        q_ref, aux_ref, remove_edge = reference_predict_ce(
            ns, net, g1, g2, prior, covered
        )

        e1 = np.asarray(list(g1.edges()), np.int32).reshape(-1, 2)
        e2 = np.asarray(list(g2.edges()), np.int32).reshape(-1, 2)
        g = build_duplex(n, e1, e2, 32, 256, node_feat=prior)
        gb = stack_graphs([g])
        covered_mask = np.zeros((1, 32), bool)
        covered_mask[0, covered] = True
        sever = np.zeros((1, 2, 256), bool)
        src = np.asarray(g.src); dst = np.asarray(g.dst)
        for l in range(2):
            for (a, b) in remove_edge[l]:
                hit = ((src[l] == a) & (dst[l] == b)) | ((src[l] == b) & (dst[l] == a))
                sever[0, l] |= hit
        inputs = make_batch_inputs(
            gb, jnp.asarray(covered_mask), jnp.asarray(sever), dense=True,
            variant="ce",
        )
        q_ours = np.asarray(model_test_forward(params, gb, inputs))[0][:n]

        live = np.isfinite(q_ref)
        assert live.any()
        np.testing.assert_allclose(q_ours[live], q_ref[live], rtol=2e-3, atol=2e-4)
        assert np.all(np.isneginf(q_ours[~live]))


def test_prior_formula_matches_reference_dataset():
    """participation_and_boundary: exact formula parity with the reference's
    CEMultiDismantler/dataset.py given the SAME partition (the louvain
    implementations differ — python-louvain there, networkx here — so the
    partition itself is an algorithmic heuristic, but the features computed
    from a partition must match exactly)."""
    import importlib.util
    import sys
    import types

    import networkx as nx
    import numpy as np

    from mdcommunity_tpu.graphs.community import participation_and_boundary

    # load the reference dataset.py with a stub python-louvain (not installed
    # in this image; only the formula under test is exercised)
    if "community" not in sys.modules:
        stub = types.ModuleType("community")
        stub.best_partition = lambda *a, **k: {}
        sys.modules["community"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_ce_dataset",
        "/root/reference/code/CEMultiDismantler/dataset.py",
    )
    ref = importlib.util.module_from_spec(spec)
    sys.modules["ref_ce_dataset"] = ref  # dataclass field resolution needs it
    spec.loader.exec_module(ref)

    rng = np.random.default_rng(0)
    n = 60
    G = nx.gnm_random_graph(n, 150, seed=1)
    # an arbitrary 4-community partition, including a node with no entry
    part = {u: int(rng.integers(0, 4)) for u in range(n - 1)}

    P_ref, b_ref = ref.participation_and_boundary(G, part, n)
    P_ours, b_ours = participation_and_boundary(G, part, n)
    np.testing.assert_allclose(P_ours, P_ref, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(b_ours, b_ref)
