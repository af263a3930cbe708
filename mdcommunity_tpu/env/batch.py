"""Batch state -> model operands (the TPU analogue of PrepareBatchGraph).

The reference walks every edge list in Python per step, drops covered/isolated
nodes, renumbers survivors into one block-diagonal batch graph and emits five
sparse operators (PrepareBatchGraph.py:76-177,217-340).  Here nothing is
renumbered: the batch keeps its padded [B, N] layout, dead nodes are masked, and
the "operators" are live-edge weights (sparse path) or dense adjacency tiles
(MXU path).  The per-graph virtual node (subgsum row) becomes a masked sum over
active nodes; act_select / rep_global become a gather / broadcast.

Feature parity notes (vs get_status_info / Setup_graph_input):
  * active node   = uncovered ∧ has a live edge (survivor sets of both layers
    coincide after the cascade — asserted at PrepareBatchGraph.py:73)
  * node_input[l] = live-degree / max-live-degree of the graph, duplicated to 2
    channels (net :102-111); degree-cost variant uses [weight, 1] instead
    (degree_cost/PrepareBatchGraph.py:133-136); CE appends the community prior.
  * aux[l] = [ |covered|/N, covered_edges_l/|E_l|, wedges_l/N², 1.0 ]
    (PrepareBatchGraph.py:92-101) where covered_edges counts unsevered edges with
    a covered endpoint (sever record is trajectory-dependent — see env/cascade.py)
    and wedges = Σ_v d_v(d_v-1)/2 reproduces the sequential two-hop counter.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mdcommunity_tpu.graphs.duplex import DuplexGraph
from mdcommunity_tpu.ops.aggregate import dense_adjacency


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchInputs:
    """Model operands for a batch of dismantling states (all leading dim B).

    adj       : f32[B, 2, N, N]  live adjacency (dense path; None for sparse)
    live_w    : f32[B, 2, E]     live-edge weights (sparse path)
    deg       : f32[B, 2, N]     live degrees
    active    : bool[B, N]       surviving (model-visible) nodes
    node_input: f32[B, 2, N, F]  input features per layer
    aux       : f32[B, 2, 4]     per-graph aux features
    n_dir_live: f32[B, 2]        directed live-edge counts (Laplacian loss denom)
    """

    adj: Optional[jnp.ndarray]
    live_w: jnp.ndarray
    deg: jnp.ndarray
    active: jnp.ndarray
    node_input: jnp.ndarray
    aux: jnp.ndarray
    n_dir_live: jnp.ndarray


def _single_inputs(
    g: DuplexGraph,
    covered: jnp.ndarray,
    sever: jnp.ndarray,
    dense: bool,
    variant: str,
) -> BatchInputs:
    pad_n = g.pad_n
    ep_alive = ~covered[g.src] & ~covered[g.dst]
    live = g.edge_mask & ~sever & ep_alive          # bool[2, E]
    w = live.astype(jnp.float32)

    deg = jax.vmap(lambda s, m: jnp.zeros(pad_n).at[s].add(m))(g.src, w)  # [2,N]
    active = (~covered) & g.node_mask & (deg[0] > 0)

    # --- node input features ------------------------------------------------
    if variant == "degree_cost":
        # [weight_v, 1.0] per layer for surviving nodes
        # (reference: degree_cost/PrepareBatchGraph.py:133-136)
        base = jnp.stack(
            [g.weights, jnp.ones_like(g.weights)], axis=-1
        )  # [2, N, 2]
        node_input = jnp.where(active[None, :, None], base, 0.0)
    else:
        maxdeg = jnp.max(jnp.where(active[None, :], deg, 0.0), axis=1)  # [2]
        nd = deg / jnp.maximum(maxdeg, 1e-12)[:, None]
        nd = jnp.where(active[None, :], nd, 0.0)
        feats = [nd, nd]
        if variant == "ce":
            # third channel: static per-layer Louvain prior
            # (CEMultiDismantler net w_n2l [3,64]; PrepareBatchGraph node_feat)
            feats.append(jnp.where(active[None, :], g.node_feat, 0.0))
        node_input = jnp.stack(feats, axis=-1)  # [2, N, F]

    # --- aux features -------------------------------------------------------
    n_f = g.n_nodes.astype(jnp.float32)
    cov_frac = jnp.sum(covered & g.node_mask) / n_f
    # unsevered edges with >=1 covered endpoint (count undirected = /2)
    cov_edge = g.edge_mask & ~sever & ~ep_alive
    counter = jnp.sum(cov_edge, axis=1).astype(jnp.float32) / 2.0
    e_cnt = jnp.maximum(g.n_edges.astype(jnp.float32), 1.0)
    wedges = jnp.sum(deg * (deg - 1.0) / 2.0, axis=1)
    aux = jnp.stack(
        [
            jnp.full((2,), cov_frac),
            counter / e_cnt,
            wedges / (n_f * n_f),
            jnp.ones((2,)),
        ],
        axis=-1,
    )  # [2, 4]

    adj = None
    if dense:
        adj = jax.vmap(lambda s, d, ww: dense_adjacency(s, d, ww, pad_n))(
            g.src, g.dst, w
        )  # [2, N, N]

    return BatchInputs(
        adj=adj,
        live_w=w,
        deg=deg,
        active=active,
        node_input=node_input,
        aux=aux,
        n_dir_live=jnp.sum(w, axis=1),
    )


def make_batch_inputs(
    g: DuplexGraph,
    covered: jnp.ndarray,
    sever: jnp.ndarray,
    dense: bool = True,
    variant: str = "unit_cost",
) -> BatchInputs:
    """Batched operand assembly (vmap over leading dim)."""
    return jax.vmap(lambda gg, c, s: _single_inputs(gg, c, s, dense, variant))(
        g, covered, sever
    )
