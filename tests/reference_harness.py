"""Import the reference implementation as a numerical test oracle.

We do NOT vendor any reference code; this shim makes the read-only reference
capsule importable on a CPU-only box so tests can compare our outputs against it:

  * fake `torch_sparse` module providing spmm() via dense scatter-add
    (the reference's only use: out = spmm(index, value, m, n, H))
  * `.cuda()` patched to a no-op (the reference hardcodes .cuda(...) in a few
    places, e.g. net :179, MRGNN :276, which breaks CPU-only torch)

Only model/batch-assembly modules are imported — never the trainer (it chdirs on
import).
"""

from __future__ import annotations

import sys
import types

REF_DIR = "/root/reference/code/MultiDismantler_unit_cost"


def _install_fake_torch_sparse():
    import torch

    if "torch_sparse" in sys.modules:
        return
    mod = types.ModuleType("torch_sparse")

    def spmm(index, value, m, n, matrix):
        out = torch.zeros((m, matrix.shape[1]), dtype=matrix.dtype)
        src = matrix[index[1]] * value.unsqueeze(1)
        out.index_add_(0, index[0], src)
        return out

    mod.spmm = spmm
    sys.modules["torch_sparse"] = mod


def _patch_cuda():
    import torch

    if getattr(torch.Tensor, "_mdct_cuda_patched", False):
        return
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.Tensor._mdct_cuda_patched = True


_REF_MODULE_NAMES = [
    "Mcc", "graph_struct", "graph", "mvc_env", "PrepareBatchGraph",
    "MultiDismantler_net_graphsage", "MultiDismantler_net",
    "GMM", "Hyperbolic", "MRGNN", "MRGNN.mutil_layer_weight",
    "MRGNN.encoders", "MRGNN.aggregators", "MRGNN.utils", "disjoint_set",
    "graphutils", "utils",
]


def load_reference_modules(variant_dir: str = REF_DIR):
    """Returns a namespace with one reference variant's model-side modules.

    Variant trees share module names, so any previously imported reference
    modules are purged before importing from `variant_dir`."""
    import numpy as np

    if not hasattr(np, "mat"):  # numpy 2.0 removed np.mat; reference uses it
        np.mat = np.asmatrix
    _install_fake_torch_sparse()
    _patch_cuda()
    for n in list(sys.modules):
        if n in _REF_MODULE_NAMES:
            del sys.modules[n]
    sys.path = [p for p in sys.path if "/root/reference/" not in p]
    sys.path.insert(0, variant_dir)
    import importlib

    names = ["Mcc", "graph_struct", "graph", "mvc_env", "PrepareBatchGraph"]
    ns = types.SimpleNamespace()
    for n in names:
        setattr(ns, n, importlib.import_module(n))
    try:
        ns.MultiDismantler_net_graphsage = importlib.import_module(
            "MultiDismantler_net_graphsage"
        )
    except ModuleNotFoundError:
        ns.MultiDismantler_net_graphsage = importlib.import_module(
            "MultiDismantler_net"
        )
    from MRGNN.mutil_layer_weight import BitwiseMultipyLogis

    ns.BitwiseMultipyLogis = BitwiseMultipyLogis
    return ns


def build_reference_net(ns, device=None):
    import torch

    device = device or torch.device("cpu")
    fusion = ns.BitwiseMultipyLogis(64, dropout=0.5, alpha=0.5, metapath_number=2, device=device)
    net = ns.MultiDismantler_net_graphsage.MultiDismantler_net(fusion, device=device)
    net.eval()
    return net


def reference_predict_degree(ns, net, nx_g1, nx_g2, covered: list):
    """Degree-cost variant Q-values: node_input = PrepareBatchGraph.node_feat
    ([weight, 1] per surviving node), net has no adj/v_adj arguments."""
    import numpy as np
    import torch

    g = ns.graph.Graph_test(nx_g1.copy(), nx_g2.copy())
    env = ns.mvc_env.MvcEnv(50)
    env.s0(g)
    for a in covered:
        env.stepWithoutReward(a)

    pbg = ns.PrepareBatchGraph.PrepareBatchGraph(0)
    pbg.SetupPredAll([0], [g], [env.action_list], [env.remove_edge])
    idx_map = [it[0] for it in pbg.idx_map_list][0]

    node_input = torch.tensor(np.array(pbg.node_feat), dtype=torch.float32)
    with torch.no_grad():
        q = net.test_forward(
            node_input=node_input,
            subgsum_param=pbg.subgsum_param,
            n2nsum_param=pbg.n2nsum_param,
            rep_global=pbg.rep_global,
            aux_input=torch.tensor(np.array(pbg.aux_feat), dtype=torch.float32),
        )
    raw = q[:, 0].numpy()
    out = np.full(g.num_nodes, -np.inf)
    pos = 0
    for k in range(len(idx_map)):
        if idx_map[k] >= 0:
            out[k] = raw[pos]
            pos += 1
    for k in env.action_list:
        out[k] = -np.inf
    assert pos == len(raw)
    return out, np.array(pbg.aux_feat), env.remove_edge


def reference_predict(ns, net, nx_g1, nx_g2, covered: list):
    """Reference pipeline Q-values for one graph state: build Graph_test, run env
    steps to materialize remove_edge, assemble PrepareBatchGraph, net.test_forward.

    Returns (q_per_original_node  float[N] with -inf for dead, aux features,
    remove_edge sets)."""
    import numpy as np
    import torch

    g = ns.graph.Graph_test(nx_g1.copy(), nx_g2.copy())
    env = ns.mvc_env.MvcEnv(50)
    env.s0(g)
    for a in covered:
        env.stepWithoutReward(a)

    pbg = ns.PrepareBatchGraph.PrepareBatchGraph(0)
    pbg.SetupPredAll([0], [g], [env.action_list], [env.remove_edge])
    idx_map = [it[0] for it in pbg.idx_map_list][0]

    with torch.no_grad():
        q = net.test_forward(
            node_input=None,
            subgsum_param=pbg.subgsum_param,
            n2nsum_param=pbg.n2nsum_param,
            rep_global=pbg.rep_global,
            aux_input=torch.tensor(np.array(pbg.aux_feat), dtype=torch.float32),
            adj=pbg.adj,
            v_adj=pbg.virtual_adj,
        )
    raw = q[:, 0].numpy()
    out = np.full(g.num_nodes, -np.inf)
    pos = 0
    for k in range(len(idx_map)):
        if idx_map[k] >= 0:
            out[k] = raw[pos]
            pos += 1
    for k in env.action_list:
        out[k] = -np.inf
    assert pos == len(raw)
    return out, np.array(pbg.aux_feat), env.remove_edge


CE_DIR = "/root/reference/code/CEMultiDismantler"
HCA_DIR = "/root/reference/code/HCA-Dismantler"
HCA_SMOKE_CKPT = (
    HCA_DIR + "/models/g0-1_10w_TORCH-Model_GMM_30_50_SMOKE/best_model.ckpt"
)


def install_fake_cdlib(seed: int = 0):
    """cdlib is not installed in this image; the HCA variant imports
    `from cdlib import algorithms` and calls `algorithms.leiden(G)`.  Shim it
    with networkx Louvain under a fixed seed — the SAME partition call our
    graphs/hca.py uses, so both pipelines see identical communities and the
    parity comparison isolates the network math."""
    if "cdlib" in sys.modules:
        return
    import networkx as nx

    mod = types.ModuleType("cdlib")
    alg = types.ModuleType("cdlib.algorithms")

    class _Coms:
        def __init__(self, communities):
            self.communities = communities

    def leiden(G):
        return _Coms(
            [sorted(c) for c in nx.community.louvain_communities(G, seed=seed)]
        )

    alg.leiden = leiden
    mod.algorithms = alg
    sys.modules["cdlib"] = mod
    sys.modules["cdlib.algorithms"] = alg


def build_reference_hca_net(ns, device=None):
    import torch

    device = device or torch.device("cpu")
    fusion = ns.BitwiseMultipyLogis(
        64, dropout=0.5, alpha=0.5, metapath_number=2, device=device
    )
    net = ns.MultiDismantler_net_graphsage.MultiDismantler_net(
        fusion, device=device
    )
    net.eval()
    return net


def reference_predict_hca(ns, net, nx_g1, nx_g2, covered: list):
    """HCA variant Q-values for one graph state.

    Graph_test lacks the `subgraphs`/`node_features` attributes the HCA env
    expects (reading them raises AttributeError, silently degrading to dummy
    zero features via the except at mvc_env.py:89-95) — attach them so the
    genuine community path runs.  Returns (q float[N] with -inf for dead,
    node_features [N, 3], communities per layer, remove_edge)."""
    import numpy as np
    import torch

    g = ns.graph.Graph_test(nx_g1.copy(), nx_g2.copy())
    g.subgraphs = [[], []]
    g.node_features = None
    env = ns.mvc_env.MvcEnv(50)
    env.s0(g)  # runs calculate_hca_features via the cdlib shim
    for a in covered:
        env.stepWithoutReward(a)

    pbg = ns.PrepareBatchGraph.PrepareBatchGraph(0)
    pbg.SetupPredAll([0], [g], [env.action_list], [env.remove_edge])
    idx_map = [it[0] for it in pbg.idx_map_list][0]

    with torch.no_grad():
        q = net.test_forward(
            node_input=pbg.node_feat_tensor,
            subgsum_param=pbg.subgsum_param,
            n2nsum_param=pbg.n2nsum_param,
            rep_global=pbg.rep_global,
            aux_input=torch.tensor(np.array(pbg.aux_feat), dtype=torch.float32),
            adj=pbg.adj,
            v_adj=pbg.virtual_adj,
            comm_adj=pbg.comm_adj_param,
        )
    raw = q.numpy().reshape(-1)
    out = np.full(g.num_nodes, -np.inf)
    pos = 0
    for k in range(len(idx_map)):
        if idx_map[k] >= 0:
            out[k] = raw[pos]
            pos += 1
    for k in env.action_list:
        out[k] = -np.inf
    assert pos == len(raw)
    return out, np.asarray(g.node_features), g.subgraphs, env.remove_edge


def reference_predict_ce(ns, net, nx_g1, nx_g2, prior, covered: list):
    """CE variant Q-values: g carries node_comm_feat = [feat0, feat1] (the
    static Louvain prior); the net consumes PrepareBatchGraph.node_feat [2,n,1]
    plus dense adj/v_adj for the degree channels."""
    import numpy as np
    import torch

    g = ns.graph.Graph_test(nx_g1.copy(), nx_g2.copy())
    g.node_comm_feat = [
        np.asarray(prior[0], np.float32), np.asarray(prior[1], np.float32)
    ]
    env = ns.mvc_env.MvcEnv(50)
    env.s0(g)
    for a in covered:
        env.stepWithoutReward(a)

    pbg = ns.PrepareBatchGraph.PrepareBatchGraph(0)
    pbg.SetupPredAll([0], [g], [env.action_list], [env.remove_edge])
    idx_map = [it[0] for it in pbg.idx_map_list][0]

    with torch.no_grad():
        q = net.test_forward(
            node_input=None,
            subgsum_param=pbg.subgsum_param,
            n2nsum_param=pbg.n2nsum_param,
            rep_global=pbg.rep_global,
            aux_input=torch.tensor(np.array(pbg.aux_feat), dtype=torch.float32),
            node_feat=torch.tensor(np.array(pbg.node_feat), dtype=torch.float32),
            adj=pbg.adj,
            v_adj=pbg.virtual_adj,
        )
    raw = q[:, 0].numpy()
    out = np.full(g.num_nodes, -np.inf)
    pos = 0
    for k in range(len(idx_map)):
        if idx_map[k] >= 0:
            out[k] = raw[pos]
            pos += 1
    for k in env.action_list:
        out[k] = -np.inf
    assert pos == len(raw)
    return out, np.array(pbg.aux_feat), env.remove_edge
