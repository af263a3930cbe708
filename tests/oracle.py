"""Independent networkx oracle for the LMCC cascade and the dismantling MDP.

Written directly from the published semantics of the mutually-connected-component
cascade (alternately sever edges of one layer that cross components of the other
until the two partitions agree; cf. reference Mcc.py:30-38) for use as a test
oracle.  Deliberately simple and slow.
"""

from __future__ import annotations

from typing import List, Sequence, Set, Tuple

import networkx as nx


def _partition(g: nx.Graph):
    comps = [frozenset(c) for c in nx.connected_components(g)]
    label = {}
    for c in comps:
        rep = min(c)
        for v in c:
            label[v] = rep
    return set(comps), label


def mcc_oracle(
    g1: nx.Graph, g2: nx.Graph
) -> Tuple[int, Set[Tuple[int, int]], Set[Tuple[int, int]], Set[frozenset]]:
    """Run the cascade on copies; return (max component size, severed edges of each
    layer as undirected (min,max) tuples, final partition)."""
    g1, g2 = g1.copy(), g2.copy()
    sever1, sever2 = set(), set()
    p1, l1 = _partition(g1)
    p2, l2 = _partition(g2)
    while p1 != p2:
        for (u, v) in list(g2.edges()):
            if l1[u] != l1[v]:
                g2.remove_edge(u, v)
                sever2.add((min(u, v), max(u, v)))
        p2, l2 = _partition(g2)
        for (u, v) in list(g1.edges()):
            if l2[u] != l2[v]:
                g1.remove_edge(u, v)
                sever1.add((min(u, v), max(u, v)))
        p1, l1 = _partition(g1)
    rank = max((len(c) for c in p1), default=0)
    return rank, sever1, sever2, p1


class OracleEnv:
    """Reference-faithful dismantling environment on networkx graphs."""

    def __init__(self, edges0, edges1, n: int):
        self.n = n
        self.e0 = [tuple(sorted(e)) for e in edges0]
        self.e1 = [tuple(sorted(e)) for e in edges1]
        g1, g2 = self._graphs(set())
        self.max_rank, *_ = mcc_oracle(g1, g2)
        self.reset()

    def _graphs(self, covered: Set[int]):
        g1, g2 = nx.Graph(), nx.Graph()
        alive = [v for v in range(self.n) if v not in covered]
        g1.add_nodes_from(alive)
        g2.add_nodes_from(alive)
        g1.add_edges_from(
            (u, v) for (u, v) in self.e0 if u not in covered and v not in covered
        )
        g2.add_edges_from(
            (u, v) for (u, v) in self.e1 if u not in covered and v not in covered
        )
        return g1, g2

    def reset(self):
        self.covered: Set[int] = set()
        self.rank, self.sev0, self.sev1, _ = self._recompute()
        self.score = 0.0
        self.ranks: List[int] = []

    def _recompute(self):
        g1, g2 = self._graphs(self.covered)
        rank, s1, s2, part = mcc_oracle(g1, g2)
        return rank, s1, s2, part

    def live_edges(self):
        l0 = [
            e
            for e in self.e0
            if e not in self.sev0 and e[0] not in self.covered and e[1] not in self.covered
        ]
        l1 = [
            e
            for e in self.e1
            if e not in self.sev1 and e[0] not in self.covered and e[1] not in self.covered
        ]
        return l0, l1

    def terminal(self) -> bool:
        l0, l1 = self.live_edges()
        return len(l0) == 0 or len(l1) == 0

    def step(self, a: int) -> float:
        assert a not in self.covered
        self.covered.add(a)
        self.rank, self.sev0, self.sev1, _ = self._recompute()
        self.ranks.append(self.rank)
        r = -self.rank / (self.max_rank * self.n)
        self.score += -r
        return r

    def valid_actions(self):
        l0, l1 = self.live_edges()
        d0 = {v for e in l0 for v in e}
        d1 = {v for e in l1 for v in e}
        return sorted(d0 & d1)
