"""Blocked large-graph duplex container: the pair-slot edge order IS the graph's
native edge order.

For training-size graphs (30-50 nodes) the model aggregates through dense MXU
tiles (env/batch.py).  For large single graphs (real multiplex nets, 10^4-10^6+
nodes) aggregation runs through the blocked-pair Pallas SpMM
(ops/pallas_spmm.py), whose layout wants per-edge state as w[P, T] in pair-slot
order.  Rather than permuting live-edge weights every step, this module builds
a DuplexGraph whose src/dst/edge_mask arrays are ALREADY in slot order (padding
slots are masked-out (0, 0) edges), so:

  * the cascade/env/masks operate on slot-ordered arrays unchanged (they are
    order-independent), and
  * the kernel's weight operand is exactly `live_w.reshape(P, T)` — zero
    permutation gathers on the hot path.

Node ids are RCM-reordered first (graphs/ordering.py) — pair fill is a
locality property of the node numbering.

No reference analogue: the reference hands torch_sparse a fresh COO every step
(PrepareBatchGraph.n2n_construct :217-261).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from mdcommunity_tpu.graphs.duplex import DuplexGraph, build_duplex
from mdcommunity_tpu.graphs.ordering import apply_order, rcm_order
from mdcommunity_tpu.ops.pallas_spmm import BlockCOO, build_block_coo


@dataclasses.dataclass(frozen=True)
class BlockedDuplex:
    """A large padded duplex graph in blocked-pair edge order.

    g       : DuplexGraph whose per-layer edge arrays are slot-ordered; pad_e =
              max over layers of that layer's slot count (shorter layer padded)
    bcoo    : per-layer BlockCOO kernel metadata
    perm    : int64[n] new position -> original node id (identity if unordered)
    """

    g: DuplexGraph
    bcoo: Tuple[BlockCOO, BlockCOO]
    perm: np.ndarray

    @property
    def pad_n(self) -> int:
        return self.g.pad_n

    def to_original(self, node_seq: Sequence[int]) -> list:
        """Map a solution in blocked ids back to original node ids."""
        return [int(self.perm[v]) for v in node_seq]


def build_blocked_duplex(
    n_nodes: int,
    edges0: np.ndarray,
    edges1: np.ndarray,
    S: int = 512,
    T: int = 512,
    reorder: bool = True,
    weights: Optional[np.ndarray] = None,
    node_feat: Optional[np.ndarray] = None,
    max_rank: Optional[int] = None,
) -> BlockedDuplex:
    """Build a blocked duplex graph from undirected edge arrays [M, 2].

    Per-node attributes (weights/node_feat, indexed by original id) are
    permuted into the blocked order automatically.
    """
    edges0 = np.asarray(edges0, np.int64).reshape(-1, 2)
    edges1 = np.asarray(edges1, np.int64).reshape(-1, 2)
    if reorder:
        perm = rcm_order(
            [edges0[:, 0], edges1[:, 0]], [edges0[:, 1], edges1[:, 1]], n_nodes
        )
    else:
        perm = np.arange(n_nodes, dtype=np.int64)

    pad_n = ((n_nodes + S - 1) // S) * S

    layers = []
    for e in (edges0, edges1):
        s, d = apply_order(perm, e[:, 0], e[:, 1])
        sd = np.concatenate([s, d]).astype(np.int32)  # both orientations
        dd = np.concatenate([d, s]).astype(np.int32)
        bcoo, slot_src, slot_dst, slot_mask = build_block_coo(sd, dd, pad_n, S, T)
        layers.append((bcoo, slot_src, slot_dst, slot_mask))

    pad_e = max(len(l[1]) for l in layers)
    pad_e = max(pad_e, 1)
    src = np.zeros((2, pad_e), np.int32)
    dst = np.zeros((2, pad_e), np.int32)
    mask = np.zeros((2, pad_e), bool)
    for l, (bcoo, ss, dd, mm) in enumerate(layers):
        src[l, : len(ss)] = ss
        dst[l, : len(dd)] = dd
        mask[l, : len(mm)] = mm

    if weights is not None:
        weights = np.asarray(weights, np.float32)[..., perm]
    if node_feat is not None:
        node_feat = np.asarray(node_feat, np.float32)[..., perm]

    g = build_duplex(
        n_nodes,
        edges0=np.zeros((0, 2), np.int32),
        edges1=np.zeros((0, 2), np.int32),
        pad_nodes=pad_n,
        pad_edges=pad_e,
        weights=weights,
        node_feat=node_feat,
        max_rank=max_rank if max_rank is not None else 0,  # recomputed below
    )
    # swap in the slot-ordered edge arrays (build_duplex computed everything
    # node-indexed; edge arrays and counts are replaced wholesale)
    import jax.numpy as jnp

    g = dataclasses.replace(
        g,
        src=jnp.asarray(src),
        dst=jnp.asarray(dst),
        edge_mask=jnp.asarray(mask),
        n_edges=jnp.asarray([len(edges0), len(edges1)], jnp.int32),
    )
    if max_rank is None:
        from mdcommunity_tpu.env.cascade import intact_max_rank

        g = dataclasses.replace(
            g, max_rank=jnp.asarray(int(intact_max_rank(g)), jnp.int32)
        )
    return BlockedDuplex(g=g, bcoo=tuple(l[0] for l in layers), perm=perm)
