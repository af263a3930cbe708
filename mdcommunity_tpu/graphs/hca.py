"""HCA-Dismantler graph-side structures: per-layer communities + node features.

Reference: HCA-Dismantler/mvc_env.calculate_hca_features (:39-136) computes, on
the *intact* graph at episode reset:
  * per-layer community partitions (Leiden via cdlib; we use networkx Louvain —
    Leiden is a refinement of Louvain and the reference itself falls back to
    dummy features when detection fails)
  * f_het(u)    = 1 - Jaccard(C1(u), C2(u))
  * f_impact(u) = log(|C1(u)|+1) · log(|C2(u)|+1)
  * f_roi(u)    = f_het·f_impact / (deg1(u)+deg2(u)+eps)
stored as [N, 3] node features; community memberships become the model's
virtual-node rows with f_roi+1e-6 pooling weights
(HCA PrepareBatchGraph.subg_construct :430-473).

All of this is static per graph, so it lives on the DuplexGraph (comm_id,
hca_feat) and is computed host-side at build time.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import networkx as nx
import numpy as np


def hca_communities_and_features(
    n: int, edges0: Sequence, edges1: Sequence, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (comm_id [2, n] int32, n_comms [2] int32, hca_feat [n, 3] f32)."""
    comm_id = np.zeros((2, n), np.int32)
    n_comms = np.zeros(2, np.int32)
    graphs = []
    partitions = []
    for l, edges in enumerate((edges0, edges1)):
        G = nx.Graph()
        G.add_nodes_from(range(n))
        G.add_edges_from(edges)
        graphs.append(G)
        comms = nx.community.louvain_communities(G, seed=seed)
        partitions.append([set(c) for c in comms])
        n_comms[l] = len(comms)
        for cid, nodes in enumerate(comms):
            for u in nodes:
                comm_id[l, u] = cid

    feat = np.zeros((n, 3), np.float32)
    eps = 1e-6
    for u in range(n):
        set1 = partitions[0][comm_id[0, u]]
        set2 = partitions[1][comm_id[1, u]]
        inter = len(set1 & set2)
        union = len(set1 | set2)
        f_het = 1.0 - inter / (union + eps)
        f_impact = math.log(len(set1) + 1) * math.log(len(set2) + 1)
        cost = graphs[0].degree[u] + graphs[1].degree[u]
        f_roi = (f_het * f_impact) / (cost + eps)
        feat[u] = [f_het, f_impact, f_roi]
    return comm_id, n_comms, feat
