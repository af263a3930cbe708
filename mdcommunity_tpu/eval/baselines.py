"""Adaptive heuristic dismantling baselines: HDA / HBA / HCA / CI.

Reference: standalone scripts under baseline/{HDA,HBA,HCA,CI}/ in each variant
(e.g. hda_2max.py, hda_add.py, ci_max.py, hba_2max.py, hca_2max.py,
hda_2max_protect.py).  Semantics (hda_2max.py:50-90):

  * adaptive: every step recompute the per-layer centrality on the current
    (cascade-reduced) live graphs
  * combine the two layers' scores with max (``2max``) or sum (``add``)
  * remove the argmax node, run the MCC cascade, record rank/max_rank and
    score += rank/(max_rank·N)
  * stop when the LMCC rank reaches 1 (not when edges run out)
  * ``protect`` variants make the top-1% initial-degree nodes immune
    (hda_2max_protect.py:61-68)
  * ``_syn`` sweep scripts stop earlier: while normalized LMCC >
    sqrt(N)/LMCC0, i.e. stop once rank <= sqrt(N)
    (hda_2max_syn.py:78-81 `new_num = math.sqrt(N)/ND_ori`); exposed here
    as ``syn_stop=True``

Degree and CI are computed on device from live-edge masks; betweenness and
closeness fall back to networkx on the live subgraph, as the reference does
(hba_2max.py:67-68 — this is inherently O(V·E) per step).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import networkx as nx
import numpy as np

from mdcommunity_tpu.env.env import batched_reset, batched_step
from mdcommunity_tpu.graphs.duplex import DuplexGraph, stack_graphs

METHODS = ("degree", "betweenness", "closeness", "ci", "pagerank")
COMBINES = ("max2", "add")


def _live_degrees(g: DuplexGraph, covered: np.ndarray, sever: np.ndarray) -> np.ndarray:
    """f32[2, N] live degrees from masks (host numpy)."""
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    em = np.asarray(g.edge_mask)
    live = em & ~sever & ~covered[src] & ~covered[dst]
    deg = np.zeros((2, g.pad_n), np.float64)
    for l in range(2):
        np.add.at(deg[l], src[l][live[l]], 1.0)
    return deg


def _ci_scores(g: DuplexGraph, covered, sever) -> np.ndarray:
    """Collective influence CI(u) = (k_u-1)·Σ_{v∈N(u)}(k_v-1) per layer
    (reference: MultiDismantler_torch.py:845-861, ci_max.py)."""
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    em = np.asarray(g.edge_mask)
    live = em & ~sever & ~covered[src] & ~covered[dst]
    deg = _live_degrees(g, covered, sever)
    out = np.zeros((2, g.pad_n), np.float64)
    for l in range(2):
        s, d = src[l][live[l]], dst[l][live[l]]
        acc = np.zeros(g.pad_n, np.float64)
        np.add.at(acc, d, deg[l][s] - 1.0)
        out[l] = (deg[l] - 1.0) * acc
        out[l][deg[l] == 0] = -1.0  # zero-degree convention (basic_ci :849-850)
    return out


def _nx_centrality(g: DuplexGraph, covered, sever, kind: str) -> np.ndarray:
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    em = np.asarray(g.edge_mask)
    live = em & ~sever & ~covered[src] & ~covered[dst]
    n = int(g.n_nodes)
    out = np.zeros((2, g.pad_n), np.float64)
    for l in range(2):
        G = nx.Graph()
        G.add_nodes_from(v for v in range(n) if not covered[v])
        G.add_edges_from(zip(src[l][live[l]].tolist(), dst[l][live[l]].tolist()))
        if kind == "betweenness":
            c = nx.betweenness_centrality(G)
        elif kind == "closeness":
            c = nx.closeness_centrality(G)
        elif kind == "pagerank":
            c = nx.pagerank(G)
        else:
            raise ValueError(kind)
        for v, val in c.items():
            out[l, v] = val
    return out


def heuristic_dismantle(
    g: DuplexGraph,
    method: str = "degree",
    combine: str = "max2",
    protect_frac: float = 0.0,
    syn_stop: bool = False,
) -> Tuple[List[int], float, List[float]]:
    """Run one adaptive heuristic dismantling.

    syn_stop=True uses the `_syn` scripts' convention: stop once the LMCC
    rank falls to sqrt(N) (hda_2max_syn.py:78-81) instead of 1.

    Returns (solution, score, MaxCCList curve starting at 1.0)."""
    assert method in METHODS and combine in COMBINES
    gb = stack_graphs([g])
    state = batched_reset(gb)
    n = int(g.n_nodes)

    protected = np.zeros(g.pad_n, bool)
    if protect_frac > 0:
        deg0 = _live_degrees(
            g, np.zeros(g.pad_n, bool), np.zeros_like(np.asarray(g.edge_mask))
        )
        comb0 = deg0.max(0) if combine == "max2" else deg0.sum(0)
        k = max(1, int(protect_frac * n))
        protected[np.argsort(-comb0[:n])[:k]] = True

    sol: List[int] = []
    curve: List[float] = [1.0]
    score = 0.0
    max_rank = float(g.max_rank)
    stop_rank = float(np.sqrt(n)) if syn_stop else 1.0

    while float(state.rank[0]) > stop_rank and len(sol) < n:
        covered = np.asarray(state.covered[0])
        sever = np.asarray(state.sever[0])
        if method == "degree":
            c = _live_degrees(g, covered, sever)
        elif method == "ci":
            c = _ci_scores(g, covered, sever)
        else:
            c = _nx_centrality(g, covered, sever, method)
        comb = c.max(0) if combine == "max2" else c.sum(0)
        comb[covered] = -np.inf
        comb[~np.asarray(g.node_mask)] = -np.inf
        comb[protected] = -np.inf
        a = int(np.argmax(comb))
        if not np.isfinite(comb[a]):
            break
        state, _ = batched_step(gb, state, jnp.asarray([a]))
        sol.append(a)
        r = float(state.rank[0])
        curve.append(r / max_rank)
        score += r / (max_rank * n)
    return sol, score, curve


def hxa(g: DuplexGraph, method: str = "HDA") -> Tuple[float, List[int]]:
    """Reference-API shim for the agent-side heuristic comparator
    (MultiDismantler_torch.HXA :821-843): 'HDA'/'HBA'/'HCA'/'HPRA' map onto the
    adaptive duplex heuristics above; returns (robustness score, solution)."""
    name = {
        "HDA": "degree",
        "HBA": "betweenness",
        "HCA": "closeness",
        "HPRA": "pagerank",
    }[method]
    sol, score, _ = heuristic_dismantle(g, method=name, combine="max2")
    return score, sol
