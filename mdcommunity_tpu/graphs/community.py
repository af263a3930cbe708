"""Community priors for the community-enhanced (CE) variant.

Reference: CEMultiDismantler/dataset.py — per-layer Louvain partition,
participation coefficient P(u) = 1 - Σ_c (k_c/k)², boundary flags, and the
union boundary-node set used for action pruning; cached as .npz
(_attach_static_comm_prior, CEMultiDismantler/MultiDismantler_torch.py:177-240).

Community detection is a host-side algorithm (as in the reference); features are
computed once per graph, cached, and fed to the device as static node features.
The reference uses python-louvain; we use networkx's Louvain implementation with
a fixed seed — the prior is an algorithmic heuristic, not part of the numerical
parity surface.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Set, Tuple

import networkx as nx
import numpy as np


def louvain_partition(G: nx.Graph, seed: int = 0) -> Dict[int, int]:
    comms = nx.community.louvain_communities(G, seed=seed)
    part = {}
    for cid, nodes in enumerate(comms):
        for v in nodes:
            part[v] = cid
    return part


def participation_and_boundary(
    G: nx.Graph, part: Dict[int, int], n: int
) -> Tuple[np.ndarray, np.ndarray]:
    P = np.zeros(n, np.float32)
    boundary = np.zeros(n, np.float32)
    for u in range(n):
        u_comm = part.get(u, 0)
        neigh = list(G.neighbors(u)) if G.has_node(u) else []
        k = len(neigh)
        if k == 0:
            continue
        counts: Dict[int, int] = {}
        is_b = False
        for v in neigh:
            c = part.get(v, 0)
            counts[c] = counts.get(c, 0) + 1
            if c != u_comm:
                is_b = True
        P[u] = 1.0 - sum((c / k) ** 2 for c in counts.values())
        boundary[u] = 1.0 if is_b else 0.0
    return P, boundary


def compute_prior(
    G: nx.Graph, n: int, feature: str = "boundary", seed: int = 0
) -> Tuple[np.ndarray, Set[int]]:
    """Returns (feature array [n] in [0,1], boundary node set)."""
    if feature == "none":
        return np.zeros(n, np.float32), set()
    part = louvain_partition(G, seed=seed)
    P, boundary = participation_and_boundary(G, part, n)
    feat = P if feature == "participation" else boundary
    feat = np.clip(np.nan_to_num(feat), 0.0, 1.0).astype(np.float32)
    return feat, set(np.where(boundary > 0.5)[0].tolist())


def duplex_prior(
    n: int,
    edges0: Sequence,
    edges1: Sequence,
    feature: str = "boundary",
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-layer prior features [2, n] + union boundary mask [n]."""
    if feature == "none":
        return np.zeros((2, n), np.float32), np.zeros(n, bool)
    feats = np.zeros((2, n), np.float32)
    bset: Set[int] = set()
    for l, edges in enumerate((edges0, edges1)):
        G = nx.Graph()
        G.add_nodes_from(range(n))
        G.add_edges_from(edges)
        feats[l], b = compute_prior(G, n, feature, seed)
        bset |= b
    bmask = np.zeros(n, bool)
    bmask[sorted(bset)] = True
    return feats, bmask


def cached_duplex_prior(
    cache_dir: str,
    cache_id: str,
    n: int,
    edges0: Sequence,
    edges1: Sequence,
    feature: str = "boundary",
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """npz-cached variant (reference cache/comm_prior_<id>_<feature>.npz)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"comm_prior_{cache_id}_{feature}.npz")
    if os.path.isfile(path):
        d = np.load(path)
        if int(d["n"]) == n:
            return d["feats"].astype(np.float32), d["boundary"].astype(bool)
    feats, bmask = duplex_prior(n, edges0, edges1, feature, seed)
    np.savez_compressed(path, n=np.int64(n), feats=feats, boundary=bmask)
    return feats, bmask
