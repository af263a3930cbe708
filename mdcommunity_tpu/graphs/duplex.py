"""Duplex (two-layer interdependent) graph containers with static, padded shapes.

The reference stores graphs as networkx adjacency lists (reference: graph.py:17-30,
Graph_test :69-84) and re-compacts indices on every environment step
(PrepareBatchGraph.py:110-163) so tensor sizes shrink as nodes die.  On TPU that
dynamic-shape strategy defeats XLA, so the design here is the opposite: every graph
is padded once to a static (pad_nodes, pad_edges) envelope and *death is a mask*,
never a reshape.  A batch of graphs is a stacked pytree; everything downstream
(cascade, environment, model) is vmap/jit over these fixed shapes.

Edges are stored as directed pairs (both orientations of each undirected edge) so
neighborhood aggregation is a single segment-sum / one-hot matmul, and the
undirected edge count is `edge_mask.sum() / 2` per layer.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DuplexGraph:
    """A (possibly batched) padded duplex graph.

    Unbatched shapes:
      src, dst    : int32[2, E]  directed endpoints; padding rows point at node 0
      edge_mask   : bool[2, E]   True for real directed edges
      node_mask   : bool[N]      True for real nodes
      n_nodes     : int32[]      true node count
      n_edges     : int32[2]     true *undirected* edge counts per layer
      max_rank    : int32[]      LMCC size of the intact duplex graph
      weights     : f32[2, N]    per-layer node removal-cost weights
                                 (unit variant: 1.0; degree variant: deg/maxdeg,
                                  reference: MultiDismantler_degree_cost/graph.py:39-51)
      node_feat   : f32[2, N]    static per-layer node prior feature (CE variant
                                 Louvain prior, reference:
                                 CEMultiDismantler/dataset.py:90-150; zeros otherwise)
      boundary    : bool[N]      CE boundary-node flag (action pruning prior)
      comm_id     : int32[2, N]  HCA per-layer community index (0 for non-HCA)
      n_comms     : int32[2]     HCA community counts per layer
      hca_feat    : f32[N, 3]    HCA node features [f_het, f_impact, f_roi]
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    edge_mask: jnp.ndarray
    node_mask: jnp.ndarray
    n_nodes: jnp.ndarray
    n_edges: jnp.ndarray
    max_rank: jnp.ndarray
    weights: jnp.ndarray
    node_feat: jnp.ndarray
    boundary: jnp.ndarray
    comm_id: jnp.ndarray
    n_comms: jnp.ndarray
    hca_feat: jnp.ndarray

    @property
    def pad_n(self) -> int:
        return self.node_mask.shape[-1]

    @property
    def pad_e(self) -> int:
        return self.src.shape[-1]

    def degrees(self) -> jnp.ndarray:
        """Structural (intact-graph) per-layer degrees, f32[2, N]."""
        w = self.edge_mask.astype(jnp.float32)
        return jax.vmap(
            lambda s, m: jnp.zeros(self.pad_n).at[s].add(m)
        )(self.src, w)


def _pad_edges_np(edges: np.ndarray, pad_e: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """edges: int array [M, 2] of undirected pairs -> directed padded (src, dst, mask)."""
    if len(edges) == 0:
        src = np.zeros(pad_e, np.int32)
        dst = np.zeros(pad_e, np.int32)
        mask = np.zeros(pad_e, bool)
        return src, dst, mask
    e = np.asarray(edges, np.int32)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    m = len(src)
    if m > pad_e:
        raise ValueError(f"graph has {m} directed edges > pad_edges={pad_e}")
    pad = pad_e - m
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    dst = np.concatenate([dst, np.zeros(pad, np.int32)])
    mask = np.concatenate([np.ones(m, bool), np.zeros(pad, bool)])
    return src, dst, mask


def build_duplex(
    n_nodes: int,
    edges0: Sequence[Tuple[int, int]],
    edges1: Sequence[Tuple[int, int]],
    pad_nodes: int,
    pad_edges: int,
    weights: np.ndarray | None = None,
    node_feat: np.ndarray | None = None,
    boundary: np.ndarray | None = None,
    max_rank: int | None = None,
    comm_id: np.ndarray | None = None,
    n_comms: np.ndarray | None = None,
    hca_feat: np.ndarray | None = None,
) -> DuplexGraph:
    """Build a padded DuplexGraph from undirected edge lists (host side).

    If max_rank is None, it is computed with the device cascade on the intact graph
    (the reference computes it with networkx at graph build time, graph.py:44-47).
    """
    if pad_nodes < n_nodes:
        raise ValueError(f"pad_nodes={pad_nodes} < n_nodes={n_nodes}")
    e0 = np.asarray(list(edges0), np.int32).reshape(-1, 2)
    e1 = np.asarray(list(edges1), np.int32).reshape(-1, 2)
    # drop self loops & dedupe (reference readers skip self loops,
    # MultiDismantler_torch.py:628-629; networkx dedupes parallel edges)
    def clean(e):
        if len(e) == 0:
            return e
        e = e[e[:, 0] != e[:, 1]]
        lo = np.minimum(e[:, 0], e[:, 1])
        hi = np.maximum(e[:, 0], e[:, 1])
        return np.unique(np.stack([lo, hi], 1), axis=0)
    e0, e1 = clean(e0), clean(e1)
    s0, d0, m0 = _pad_edges_np(e0, pad_edges)
    s1, d1, m1 = _pad_edges_np(e1, pad_edges)
    node_mask = np.arange(pad_nodes) < n_nodes
    if weights is None:
        weights = np.ones((2, pad_nodes), np.float32)
    else:
        w = np.zeros((2, pad_nodes), np.float32)
        w[:, : weights.shape[1]] = weights
        weights = w
    if node_feat is None:
        node_feat = np.zeros((2, pad_nodes), np.float32)
    else:
        node_feat = np.asarray(node_feat, np.float32)
        if node_feat.ndim == 1:
            node_feat = np.stack([node_feat, node_feat])
        f = np.zeros((2, pad_nodes), np.float32)
        f[:, : node_feat.shape[1]] = node_feat
        node_feat = f
    if boundary is None:
        boundary = np.zeros(pad_nodes, bool)
    else:
        b = np.zeros(pad_nodes, bool)
        b[: len(boundary)] = boundary
        boundary = b
    if comm_id is None:
        comm_id = np.zeros((2, pad_nodes), np.int32)
    else:
        c = np.zeros((2, pad_nodes), np.int32)
        c[:, : comm_id.shape[1]] = comm_id
        comm_id = c
    if n_comms is None:
        n_comms = np.zeros(2, np.int32)
    if hca_feat is None:
        hca_feat = np.zeros((pad_nodes, 3), np.float32)
    else:
        f3 = np.zeros((pad_nodes, 3), np.float32)
        f3[: hca_feat.shape[0]] = hca_feat
        hca_feat = f3

    # Leaves stay NUMPY on the host: graphs are built in bulk (1000/pool regen)
    # and a per-graph jnp.asarray would cost 13 tiny host->device transfers each
    # (~ms apiece through the TPU relay -> minutes per regen).  The pool is
    # device_put ONCE when GraphPool.stacked materializes.
    g = DuplexGraph(
        src=np.stack([s0, s1]),
        dst=np.stack([d0, d1]),
        edge_mask=np.stack([m0, m1]),
        node_mask=node_mask,
        n_nodes=np.int32(n_nodes),
        n_edges=np.asarray([len(e0), len(e1)], np.int32),
        max_rank=np.int32(0),
        weights=np.asarray(weights, np.float32),
        node_feat=np.asarray(node_feat, np.float32),
        boundary=boundary,
        comm_id=np.asarray(comm_id, np.int32),
        n_comms=np.asarray(n_comms, np.int32),
        hca_feat=np.asarray(hca_feat, np.float32),
    )
    if max_rank is None:
        from mdcommunity_tpu.env.cascade import intact_max_rank

        max_rank = int(intact_max_rank(g))
    return dataclasses.replace(g, max_rank=np.int32(max_rank))


def stack_graphs(graphs: List[DuplexGraph]) -> DuplexGraph:
    """Stack same-padding graphs into a batched DuplexGraph (leading axis B).

    Host-built (numpy-leaf) graphs stack with numpy — zero device traffic;
    device-resident graphs fall back to jnp.stack.
    """

    def _stack(*xs):
        if all(isinstance(x, (np.ndarray, np.generic)) for x in xs):
            return np.stack(xs)
        return jnp.stack(xs)

    return jax.tree_util.tree_map(_stack, *graphs)


@jax.jit
def index_graphs(batched: DuplexGraph, idx: jnp.ndarray) -> DuplexGraph:
    """Gather a sub-batch of a batched DuplexGraph by integer indices (jitted:
    one fused dispatch instead of an eager gather per pytree leaf)."""
    return jax.tree_util.tree_map(lambda x: x[idx], batched)


class GraphPool:
    """Train/valid graph pools (reference: GSet, graph.py:49-67).

    Holds a batched DuplexGraph on device; sampling returns indices so replay can
    store graph ids instead of graph payloads.
    """

    def __init__(self):
        self._graphs: List[DuplexGraph] = []
        self._stacked: DuplexGraph | None = None
        self._stacked_s0 = None
        self._s0_sever_host: np.ndarray | None = None

    def insert(self, g: DuplexGraph):
        self._graphs.append(g)
        self._stacked = None
        self._stacked_s0 = None
        self._s0_sever_host = None

    def clear(self):
        self._graphs = []
        self._stacked = None
        self._stacked_s0 = None
        self._s0_sever_host = None

    def __len__(self):
        return len(self._graphs)

    @property
    def stacked(self) -> DuplexGraph:
        if self._stacked is None:
            if not self._graphs:
                raise ValueError("empty GraphPool")
            # one bulk transfer for the whole pool (numpy leaves would otherwise
            # be re-uploaded by every jitted call that takes `stacked`)
            self._stacked = jax.device_put(stack_graphs(self._graphs))
        return self._stacked

    @property
    def stacked_s0(self):
        """Batched reset EnvState for every pool graph, computed once per pool
        in ONE device call.  Rollouts with device-side episode auto-reset gather
        rows of this instead of re-running the t=0 cascade per episode."""
        if self._stacked_s0 is None:
            from mdcommunity_tpu.env.env import batched_reset

            self._stacked_s0 = batched_reset(self.stacked)
        return self._stacked_s0

    @property
    def s0_sever_host(self) -> np.ndarray:
        """Host copy of the t=0 severed-edge masks, bool[P, 2, E] — lets the
        trajectory bookkeeping seed fresh episodes without a device round trip."""
        if self._s0_sever_host is None:
            self._s0_sever_host = np.asarray(self.stacked_s0.sever)
        return self._s0_sever_host

    def get(self, gid: int) -> DuplexGraph:
        return self._graphs[gid]

    def sample_ids(self, rng: np.random.Generator, k: int) -> np.ndarray:
        return rng.integers(0, len(self._graphs), size=k)


class EpochGraphRing:
    """Device-resident ring of the last K training-pool epochs.

    The reference's replay stores graph OBJECTS, so old transitions stay bound
    to their graph across the 1000-iter pool regenerations
    (MultiDismantler_torch.py gen_new_graphs :151-160 + nstep_replay_mem).  A
    replay that stores plain pool indices would silently re-bind old
    transitions to the NEW pool's graphs after each regen — semantically
    corrupt training data.  This ring keeps the last K pools stacked as one
    device batch (one bulk donated write per epoch, no per-graph transfers);
    replay stores absolute slot ids plus the slot's epoch tag so stale
    references are detectable at sample time.
    """

    def __init__(self, epochs: int = 8):
        self.k = epochs
        self.epoch = -1
        self.pool_size = 0
        self._g: DuplexGraph | None = None
        self._s0 = None
        self.slot_epoch: np.ndarray | None = None
        self._s0_sever_host: np.ndarray | None = None
        self._writer = None

    def __len__(self):
        return self.pool_size if self.epoch >= 0 else 0

    @property
    def base(self) -> int:
        """Slot offset of the current epoch's pool."""
        return (self.epoch % self.k) * self.pool_size

    @property
    def stacked(self) -> DuplexGraph:
        return self._g

    @property
    def stacked_s0(self):
        return self._s0

    @property
    def s0_sever_host(self) -> np.ndarray:
        return self._s0_sever_host

    def write_epoch(self, graphs: List[DuplexGraph]) -> None:
        """Install a freshly generated pool as the new current epoch."""
        from mdcommunity_tpu.env.env import batched_reset

        p = len(graphs)
        batch = jax.device_put(stack_graphs(graphs))
        s0 = batched_reset(batch)
        if self._g is None or self.pool_size != p:
            self.pool_size = p
            self.epoch = 0
            tile = lambda x: jnp.concatenate([x] * self.k, axis=0)
            self._g = jax.tree_util.tree_map(tile, batch)
            self._s0 = jax.tree_util.tree_map(tile, s0)
            self.slot_epoch = np.full(self.k * p, -1, np.int64)
            self._s0_sever_host = np.zeros(
                (self.k * p,) + s0.sever.shape[1:], bool
            )

            def write(ring_g, ring_s0, b, s, idx):
                upd = lambda r, x: r.at[idx].set(x)
                return (
                    jax.tree_util.tree_map(upd, ring_g, b),
                    jax.tree_util.tree_map(upd, ring_s0, s),
                )

            self._writer = jax.jit(write, donate_argnums=(0, 1))
        else:
            self.epoch += 1
        base = self.base
        idx = jnp.arange(base, base + p)
        self._g, self._s0 = self._writer(self._g, self._s0, batch, s0, idx)
        self.slot_epoch[base : base + p] = self.epoch
        self._s0_sever_host[base : base + p] = np.asarray(s0.sever)

    def sample_slots(self, rng: np.random.Generator, k: int) -> np.ndarray:
        return self.base + rng.integers(0, self.pool_size, size=k)

    def slots_live(self, slots: np.ndarray, epochs: np.ndarray) -> np.ndarray:
        """bool[k]: slot still holds the graph from `epochs` (not overwritten)."""
        return self.slot_epoch[slots] == epochs
