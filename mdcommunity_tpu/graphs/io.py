"""Graph I/O: real multiplex `.edges` files and synthetic `.npy` adjacency pairs.

File formats follow the reference:
  * `.edges` multiplex: whitespace rows `layer_id u v [w]`, node ids 1-based,
    self-loops skipped (reference: MultiDismantler_torch.read_multiplex :602-635).
  * synthetic eval: `adj1_<i>.npy` / `adj2_<i>.npy` dense adjacency pairs
    (reference: MultiDismantler_torch.Evaluate :575-576).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from mdcommunity_tpu.graphs.duplex import DuplexGraph, build_duplex


def read_multiplex_edges(path: str, n_nodes: int) -> Dict[int, np.ndarray]:
    """Parse a multiplex .edges file into {layer_id: undirected edge array [M,2]}.

    Node ids are converted to 0-based; self loops dropped; layer ids keep their
    1-based file values (dataset tables cite them 1-based, testReal.py:27-68).
    """
    layers: Dict[int, list] = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) < 3:
                continue
            lid = int(parts[0])
            u = int(parts[1]) - 1
            v = int(parts[2]) - 1
            if u == v:
                continue
            if not (0 <= u < n_nodes and 0 <= v < n_nodes):
                raise ValueError(f"node id out of range in {path}: {line!r}")
            layers.setdefault(lid, []).append((u, v))
    return {
        lid: np.asarray(e, np.int32).reshape(-1, 2) for lid, e in layers.items()
    }


def duplex_from_layers(
    n_nodes: int,
    edges_a: np.ndarray,
    edges_b: np.ndarray,
    pad_nodes: Optional[int] = None,
    pad_edges: Optional[int] = None,
    degree_cost: bool = False,
    prior_feature: Optional[str] = None,
    prior_cache: Optional[Tuple[str, str]] = None,
    hca: bool = False,
    max_rank: Optional[int] = None,
) -> DuplexGraph:
    """Two undirected edge arrays -> padded DuplexGraph (reference: Graph_test,
    graph.py:69-84).  max_rank overrides the device-cascade computation
    (callers on the blocked large-graph path compute it host-side — the
    device cascade's full-table gathers crash the worker at 10^6 nodes).

    hca=True computes the hierarchical community structure + micro/meso/macro
    features at load (graphs/hca.py; the reference computes these per graph
    in mvc_env.calculate_hca_features :39-136).

    prior_feature ('boundary'|'participation'): attach the CE community prior
    (Louvain per layer) as node_feat + boundary mask — the reference attaches
    this at real-data load time too (_attach_static_comm_prior,
    CEMultiDismantler/MultiDismantler_torch.py:743).  prior_cache =
    (cache_dir, cache_id) enables the npz cache (dataset.cache_path_for_real)."""
    def up(x, m):
        return ((max(int(x), 1) + m - 1) // m) * m

    pad_nodes = pad_nodes or up(n_nodes, 8)
    need_e = 2 * max(len(edges_a), len(edges_b), 1)
    pad_edges = pad_edges or up(need_e, 128)
    weights = None
    if degree_cost:
        from mdcommunity_tpu.graphs.gmm import _degree_weights

        weights = _degree_weights(n_nodes, edges_a, edges_b)
    comm_kwargs = {}
    if hca:
        from mdcommunity_tpu.graphs.hca import hca_communities_and_features

        comm_id, n_comms, hca_feat = hca_communities_and_features(
            n_nodes, edges_a, edges_b
        )
        comm_kwargs = dict(comm_id=comm_id, n_comms=n_comms, hca_feat=hca_feat)
    node_feat = boundary = None
    if prior_feature and prior_feature != "none":
        from mdcommunity_tpu.graphs.community import (
            cached_duplex_prior,
            duplex_prior,
        )

        if prior_cache:
            node_feat, boundary = cached_duplex_prior(
                prior_cache[0], prior_cache[1], n_nodes, edges_a, edges_b,
                prior_feature,
            )
        else:
            node_feat, boundary = duplex_prior(
                n_nodes, edges_a, edges_b, prior_feature
            )
    return build_duplex(
        n_nodes, edges_a, edges_b, pad_nodes, pad_edges, weights=weights,
        node_feat=node_feat, boundary=boundary, max_rank=max_rank,
        **comm_kwargs,
    )


def load_real_duplex(
    path: str,
    n_nodes: int,
    layer_pair: Tuple[int, int],
    degree_cost: bool = False,
    prior_feature: Optional[str] = None,
    prior_cache_dir: Optional[str] = None,
    hca: bool = False,
    max_rank: Optional[int] = None,
) -> DuplexGraph:
    """Load a real multiplex network and select the two coupled layers."""
    layers = read_multiplex_edges(path, n_nodes)
    a, b = layer_pair
    ea = layers.get(a, np.zeros((0, 2), np.int32))
    eb = layers.get(b, np.zeros((0, 2), np.int32))
    cache = None
    if prior_cache_dir and prior_feature and prior_feature != "none":
        base = os.path.basename(path).split(".")[0]
        # '-' separator: f"{a}{b}" is ambiguous for multi-digit layer ids
        # ((1,11) vs (11,1) both concatenate to "111")
        cache = (prior_cache_dir, f"{base}_layers{a}-{b}")
    return duplex_from_layers(
        n_nodes, ea, eb, degree_cost=degree_cost,
        prior_feature=prior_feature, prior_cache=cache, hca=hca,
        max_rank=max_rank,
    )


def edges_from_dense_adj(adj: np.ndarray) -> np.ndarray:
    """Dense symmetric adjacency -> undirected edge list [M, 2]."""
    iu, ju = np.nonzero(np.triu(adj, k=1))
    return np.stack([iu, ju], axis=1).astype(np.int32)


def load_synthetic_pair(adj1_path: str, adj2_path: str, degree_cost: bool = False) -> DuplexGraph:
    a1 = np.load(adj1_path)
    a2 = np.load(adj2_path)
    n = a1.shape[0]
    return duplex_from_layers(
        n, edges_from_dense_adj(a1), edges_from_dense_adj(a2), degree_cost=degree_cost
    )


# Dataset table for real multiplex networks: name -> (filename, N, (layer_a, layer_b)).
# Mirrors the hardcoded list in the reference eval entry (testReal.py:27-68).
REAL_DATASETS = {
    "fb-tw": ("fb-tw.edges", 1043, (1, 2)),
    "EUAirTransportation_multiplex": ("EUAirTransportation_multiplex.edges", 450, (1, 11)),
    "Padgett-Florentine-Families_multiplex": (
        "Padgett-Florentine-Families_multiplex.edges", 16, (1, 2)),
    "humanHIV1_genetic_multiplex": ("humanHIV1_genetic_multiplex.edges", 1005, (1, 5)),
    "Lazega-Law-Firm_multiplex": ("Lazega-Law-Firm_multiplex.edges", 71, (1, 3)),
    "fao_trade_multiplex": ("fao_trade_multiplex.edges", 214, (3, 24)),
    "celegans_connectome_multiplex": ("celegans_connectome_multiplex.edges", 279, (2, 3)),
    "sacchpomb_genetic_multiplex": ("sacchpomb_genetic_multiplex.edges", 4092, (4, 6)),
    "arxiv_netscience_multiplex": ("arxiv_netscience_multiplex.edges", 14488, (4, 8)),
    "homo_genetic_multiplex": ("homo_genetic_multiplex.edges", 18222, (1, 2)),
    "netsci_co-authorship_multiplex": ("netsci_co-authorship_multiplex.edges", 1400, (1, 2)),
}


def summarize_multiplex_dir(real_dir: str, output_csv: Optional[str] = None):
    """Scan a directory of .edges files and recommend a coupled layer pair per
    dataset (reference: summarize_real_edges.py — score = 0.3·size-parity +
    0.5·node-overlap + 0.2·edge-count representativeness, :7-33).

    Returns a list of dicts (dataset, n_nodes, n_layers, layer_m, layer_n);
    optionally writes them as CSV in the reference's column order.
    """
    import csv
    import itertools
    import os

    rows = []
    for fname in sorted(os.listdir(real_dir)):
        if not fname.endswith(".edges"):
            continue
        nodes: Dict[int, set] = {}
        n_edges: Dict[int, int] = {}
        max_node = 0
        with open(os.path.join(real_dir, fname)) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 3:
                    continue
                try:
                    lid, u, v = int(parts[0]), int(parts[1]), int(parts[2])
                except ValueError:
                    continue
                nodes.setdefault(lid, set()).update((u, v))
                n_edges[lid] = n_edges.get(lid, 0) + 1
                max_node = max(max_node, u, v)
        row = {
            "dataset": fname[: -len(".edges")],
            "n_nodes": max_node,
            "n_layers": len(nodes),
            "layer_m": "",
            "layer_n": "",
        }
        if len(nodes) >= 2:
            e_max = max(n_edges.values())
            best = None
            for a, b in itertools.combinations(sorted(nodes), 2):
                na, nb = len(nodes[a]), len(nodes[b])
                size_par = 1.0 - abs(na - nb) / max(na, nb) if max(na, nb) else 0.0
                overlap = (
                    len(nodes[a] & nodes[b]) / min(na, nb) if min(na, nb) else 0.0
                )
                repr_ = (n_edges.get(a, 0) + n_edges.get(b, 0)) / (2.0 * e_max)
                s = 0.3 * size_par + 0.5 * overlap + 0.2 * repr_
                if best is None or s > best[0]:
                    best = (s, a, b)
            row["layer_m"], row["layer_n"] = best[1], best[2]
        rows.append(row)

    if output_csv:
        os.makedirs(os.path.dirname(output_csv) or ".", exist_ok=True)
        with open(output_csv, "w", newline="") as f:
            wr = csv.DictWriter(
                f, fieldnames=["dataset", "n_nodes", "n_layers", "layer_m", "layer_n"]
            )
            wr.writeheader()
            wr.writerows(rows)
    return rows
