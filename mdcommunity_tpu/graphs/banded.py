"""Banded large-graph duplex container: dense-band aggregation state.

For large single graphs (real multiplex nets, 10^4-10^6+ nodes) the model's
neighborhood aggregation runs through the block-banded dense engine
(ops/dense_band.py) after an RCM locality ordering, and the dismantling
environment runs on the HOST (env/host_env.py) — mirroring the reference's
CPU-env / device-model split (MvcEnv + CUDA net) but with the device side
jitted end-to-end per step.

The container is a jit-able pytree: per-layer DenseBandGraphs plus the
per-node attributes the model consumes.  Liveness is rank-1 (covered mask ->
row/col scales) and cascade-severed edges are base edits (sever_edges),
applied incrementally by the eval loop as the host env reports them.

Reference analogue: none — the reference rebuilds torch_sparse COO operands
from scratch every step (PrepareBatchGraph.py:76-177).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdcommunity_tpu.graphs.ordering import apply_order, rcm_order
from mdcommunity_tpu.ops.dense_band import (
    DenseBandGraph,
    build_dense_band,
    sever_edges,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandedDuplex:
    """Large padded duplex graph backed by per-layer dense-band adjacency.

    dbg0/dbg1 : DenseBandGraph per layer (symmetric storage, ordered ids)
    node_mask : bool[pad_n] real-node mask
    weights   : f32[2, pad_n] per-layer node weights (degree-cost; ones else)
    node_feat : f32[2, pad_n] static per-layer prior feature (CE; zeros else)
    n_nodes   : int32[] real node count
    n_edges   : f32[2] undirected edge counts per layer
    max_rank  : int32[] intact LMCC size
    """

    dbg0: DenseBandGraph
    dbg1: DenseBandGraph
    node_mask: jnp.ndarray
    weights: jnp.ndarray
    node_feat: jnp.ndarray
    n_nodes: jnp.ndarray
    n_edges: jnp.ndarray
    max_rank: jnp.ndarray

    @property
    def pad_n(self) -> int:
        return self.dbg0.pad_n

    def dbg(self, layer: int) -> DenseBandGraph:
        return self.dbg0 if layer == 0 else self.dbg1


def build_banded_duplex(
    n_nodes: int,
    edges0: np.ndarray,
    edges1: np.ndarray,
    S: int = 256,
    B: int = 128,
    reorder: bool = True,
    weights: Optional[np.ndarray] = None,
    node_feat: Optional[np.ndarray] = None,
    max_rank: Optional[int] = None,
) -> Tuple[BandedDuplex, np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Build from undirected edge arrays [M, 2] (original node ids).

    Returns (banded, perm, (ordered_edges0, ordered_edges1)) where perm maps
    new position -> original id and the ordered edge arrays (new ids) feed the
    host environment.  Per-node attributes are permuted automatically.
    """
    edges0 = np.asarray(edges0, np.int64).reshape(-1, 2)
    edges1 = np.asarray(edges1, np.int64).reshape(-1, 2)
    if reorder:
        # spill-aware ordering: input order vs RCM, plus the spectral ring
        # order when both miss the band badly (RCM's BFS levels explode on
        # small-world graphs — the r03 1M probe measured 11% spill under
        # RCM on a shuffled-id ring-local graph; the spectral order
        # recovers the circular structure)
        from mdcommunity_tpu.graphs.ordering import best_band_order

        perm = best_band_order(
            [edges0[:, 0], edges1[:, 0]], [edges0[:, 1], edges1[:, 1]],
            n_nodes, B,
        )
    else:
        perm = np.arange(n_nodes, dtype=np.int64)

    # adaptive mirror capacity: blocks whose overflow-touched rows exceed C
    # spill to the full-table COO path — exactly the TPU-hostile gather the
    # band design avoids.  Grow C (per build, both layers share the schedule)
    # until spill is < 0.2% of edges or the cap is reached; C rows cost
    # (C/S) extra base bytes, so doubling from 64 to 256 is at most +75%
    # base on the affected build while removing table-scan gathers.
    ordered = [None, None]
    sym = []
    for li, e in enumerate((edges0, edges1)):
        s, d = apply_order(perm, e[:, 0], e[:, 1])
        ordered[li] = np.stack([s, d], axis=1)
        sym.append((np.concatenate([s, d]), np.concatenate([d, s])))
    dbgs = None
    for mm in (64, 128, 256):
        dbgs = [
            build_dense_band(ss, dd, None, n_nodes, S=S, B=B, max_mirror=mm)
            for ss, dd in sym
        ]
        n_spill = sum(int(g.spill.d_src.shape[0]) for g in dbgs)
        n_all = max(sum(len(ss) for ss, _ in sym), 1)
        if n_spill / n_all < 0.002:
            break
    pad_n = dbgs[0].pad_n

    node_mask = np.zeros(pad_n, bool)
    node_mask[:n_nodes] = True
    if weights is not None:
        w = np.zeros((2, pad_n), np.float32)
        w[:, :n_nodes] = np.asarray(weights, np.float32)[..., perm]
    else:
        w = np.ones((2, pad_n), np.float32)
    if node_feat is not None:
        nf = np.zeros((2, pad_n), np.float32)
        nf[:, :n_nodes] = np.asarray(node_feat, np.float32)[..., perm]
    else:
        nf = np.zeros((2, pad_n), np.float32)

    if max_rank is None:
        from mdcommunity_tpu.env.host_env import make_host_env

        env = make_host_env(n_nodes, ordered[0], ordered[1])
        max_rank = env.max_rank

    banded = BandedDuplex(
        dbg0=dbgs[0],
        dbg1=dbgs[1],
        node_mask=jnp.asarray(node_mask),
        weights=jnp.asarray(w),
        node_feat=jnp.asarray(nf),
        n_nodes=jnp.int32(n_nodes),
        n_edges=jnp.asarray([len(edges0), len(edges1)], jnp.float32),
        max_rank=jnp.int32(max_rank),
    )
    return banded, perm, tuple(ordered)


def shard_banded_duplex(mesh, banded: BandedDuplex) -> BandedDuplex:
    """Place a BandedDuplex for the gp-sharded model forward: both layers'
    band operators block-sharded (parallel/band_partition.shard_band_graph),
    node-dimension attributes sharded over 'gp', scalars replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdcommunity_tpu.parallel.band_partition import shard_band_graph

    node = NamedSharding(mesh, P("gp"))
    node2 = NamedSharding(mesh, P(None, "gp"))
    rep = NamedSharding(mesh, P())
    return dataclasses.replace(
        banded,
        dbg0=shard_band_graph(mesh, banded.dbg0),
        dbg1=shard_band_graph(mesh, banded.dbg1),
        node_mask=jax.device_put(banded.node_mask, node),
        weights=jax.device_put(banded.weights, node2),
        node_feat=jax.device_put(banded.node_feat, node2),
        n_nodes=jax.device_put(banded.n_nodes, rep),
        n_edges=jax.device_put(banded.n_edges, rep),
        max_rank=jax.device_put(banded.max_rank, rep),
    )


def pack_duplex(banded: BandedDuplex, G: int = 8, nibble: bool = False):
    """Kernel-ready packed re-layouts for both layers:
    (pack_band(dbg0), pack_band(dbg1)) — feed models.net_packed.
    Once packed, severs MUST go through apply_severs_packed.
    nibble: 4-bit base packing (requires simple-graph adjacency values
    <= 7; a measured NEGATIVE on v5e — see ops/band_pallas.pack_band)."""
    from mdcommunity_tpu.ops.band_pallas import pack_band

    return (
        pack_band(banded.dbg0, G=G, nibble=nibble),
        pack_band(banded.dbg1, G=G, nibble=nibble),
    )


def apply_severs_packed(
    banded: BandedDuplex,
    pks,
    layer: int,
    sev_src: jnp.ndarray,
    sev_dst: jnp.ndarray,
    valid: jnp.ndarray,
):
    """apply_severs for the packed backend: edits the layer's DenseBandGraph
    AND its frozen packed re-layout consistently (ops.band_pallas
    sever_edges_packed).  Returns (banded, pks)."""
    from mdcommunity_tpu.ops.band_pallas import sever_edges_packed

    src2 = jnp.concatenate([sev_src, sev_dst])
    dst2 = jnp.concatenate([sev_dst, sev_src])
    v2 = jnp.concatenate([valid, valid])
    pk, dbg = sever_edges_packed(pks[layer], banded.dbg(layer), src2, dst2, v2)
    banded = dataclasses.replace(
        banded, **({"dbg0": dbg} if layer == 0 else {"dbg1": dbg})
    )
    pks = (pk, pks[1]) if layer == 0 else (pks[0], pk)
    return banded, pks


def apply_severs(
    banded: BandedDuplex,
    layer: int,
    sev_src: jnp.ndarray,
    sev_dst: jnp.ndarray,
    valid: jnp.ndarray,
) -> BandedDuplex:
    """Zero newly-severed undirected edges in one layer's band (both directed
    copies).  sev_src/sev_dst: int32[K] padded, valid: bool[K]."""
    dbg = banded.dbg(layer)
    src2 = jnp.concatenate([sev_src, sev_dst])
    dst2 = jnp.concatenate([sev_dst, sev_src])
    v2 = jnp.concatenate([valid, valid])
    dbg = sever_edges(dbg, src2, dst2, v2)
    return dataclasses.replace(
        banded, **({"dbg0": dbg} if layer == 0 else {"dbg1": dbg})
    )
