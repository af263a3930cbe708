"""The interdependent-network LMCC cascade as a jit-compatible fixed point.

Reference semantics (Mcc.py:30-38 + mvc_env.py:140-162): after node removals, the
two layers' connected-component partitions must agree; edges of one layer whose
endpoints lie in different components of the *other* layer are severed, and the
process alternates until both partitions coincide.  Severed edges are recorded and
persist in the MDP state.  The largest set in the common partition is the LMCC
("rank").

This file re-derives that as masks + fixed points instead of networkx mutation:

* Connected components = iterated min-label propagation with pointer-jumping
  shortcuts (`lab <- min(lab, lab[lab], min-neighbor label)`), a `lax.while_loop`
  with a data-independent convergence test.  O(E) work per round, O(log N)-ish
  rounds on typical graphs.
* The cascade = outer `lax.while_loop` alternating the two layers, severing live
  edges whose endpoints carry different labels in the other layer.  The final
  severed set equals the reference's: severing is monotone (an edge that crosses
  components keeps crossing as more edges disappear), so every maximal deletion
  sequence reaches the same greatest fixed point — deletion order, which differs
  between this implementation and Mcc.py's, cannot change the result.

Trajectory (in)dependence — important subtlety the tests pin down:
  For a fixed covered-node set C, the *live* subgraph (unsevered edges between
  uncovered nodes) is a pure function of (graph, C) — the greatest fixed point.
  The accumulated severed set is NOT: an edge can be severed at step s and have an
  endpoint covered later; it stays in the severed record (the reference's
  remove_edge never shrinks) whereas a from-scratch cascade on C never severs it
  (its endpoint is already dead).  That record feeds the covered-edge aux feature
  (PrepareBatchGraph.get_status_info :45-74 skips severed edges before counting
  covered ones), so exact parity requires threading the true severed mask through
  replay — see rl/replay.py.  Restricted to edges with both endpoints uncovered,
  incremental and from-scratch severed sets DO coincide.

All functions are shape-static and vmap/jit friendly; node death is a mask.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mdcommunity_tpu.graphs.duplex import DuplexGraph

# Sentinel label for dead nodes: bigger than any node index.
_BIG = jnp.int32(2**30)


def _propagate_once(lab, src, dst, w_mask, pad_n):
    """One label-propagation round: lab[v] <- min(lab[v], lab[lab[v]], min_{u~v} lab[u])."""
    # min over incoming live edges (segment-min of src labels at dst)
    msg = jnp.full((pad_n,), _BIG, dtype=lab.dtype)
    edge_lab = jnp.where(w_mask, lab[src], _BIG)
    msg = msg.at[dst].min(edge_lab)
    # pointer jumping: follow current representative (clip sentinel for safe gather)
    jump = lab[jnp.clip(lab, 0, pad_n - 1)]
    jump = jnp.where(lab < pad_n, jump, lab)
    return jnp.minimum(jnp.minimum(lab, msg), jump)


def _cc_labels(alive_node, src, dst, live_edge, pad_n):
    """Connected-component labels (= min node index in component) for one layer.

    Dead nodes get the sentinel _BIG.  int32[pad_n].
    """
    init = jnp.where(alive_node, jnp.arange(pad_n, dtype=jnp.int32), _BIG)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = _propagate_once(lab, src, dst, live_edge, pad_n)
        return new, jnp.any(new != lab)

    # one unconditional round, then iterate to convergence
    lab0 = _propagate_once(init, src, dst, live_edge, pad_n)
    lab, _ = jax.lax.while_loop(cond, body, (lab0, jnp.any(lab0 != init)))
    return lab


def connected_components(alive_node, src, dst, live_edge):
    """Public helper: component labels for one layer (min-index labeling)."""
    pad_n = alive_node.shape[0]
    return _cc_labels(alive_node, src, dst, live_edge, pad_n)


class CascadeResult(NamedTuple):
    rank: jnp.ndarray        # int32[] LMCC size (max mutually-connected comp.)
    sever: jnp.ndarray       # bool[2, E] updated severed-edge masks
    labels: jnp.ndarray      # int32[N] common partition labels (sentinel=dead)
    live_edge: jnp.ndarray   # bool[2, E] final live (unsevered, endpoints alive)


# Below this pad_n, the cascade runs on dense [N,N] reachability matrices
# (boolean matrix squaring on the MXU) instead of per-edge label propagation.
# 128 keeps the matrices at 1-2 MXU tiles and integer row sums exact in f32.
_DENSE_CASCADE_MAX_N = 128


def _closure(adj_f32: jnp.ndarray, n_sq: int) -> jnp.ndarray:
    """Transitive closure of a symmetric 0/1 adjacency (self-loops included) by
    repeated squaring: after k squarings R covers paths of length 2^k.  All the
    work is [N,N]x[N,N] matmuls — MXU, no scatters, no data-dependent loops."""
    r = adj_f32
    for _ in range(n_sq):
        r = jnp.minimum(jnp.matmul(r, r, precision=jax.lax.Precision.DEFAULT), 1.0)
    return r


def _dense_cascade(g: DuplexGraph, covered: jnp.ndarray, sever: jnp.ndarray) -> CascadeResult:
    """MXU formulation of `cascade` for small (training-size) graphs.

    Connected components never materialize as labels: the closure matrix R IS the
    same-component relation, so "sever layer-l edges whose endpoints lie in
    different components of the other layer" is the dense mask  live_l & ~R_other
    — a broadcast elementwise op.  Everything is [N,N] matmuls + elementwise;
    the only per-edge ops are one scatter (edges -> dense) at entry and one
    gather (dense -> edge sever mask) at exit.
    """
    pad_n = g.pad_n
    n_sq = max(1, (pad_n - 1).bit_length())
    alive = g.node_mask & ~covered
    ep = ~covered[g.src] & ~covered[g.dst]
    live0 = g.edge_mask & ~sever & ep
    # dense live adjacency per layer (edges are stored in both directions so
    # the scatter already yields a symmetric matrix)
    adj = jax.vmap(
        lambda s, d, m: jnp.zeros((pad_n, pad_n), jnp.float32).at[s, d].max(
            m.astype(jnp.float32)
        )
    )(g.src, g.dst, live0)
    eye = jnp.eye(pad_n, dtype=jnp.float32)

    def body(state):
        adj2, _ = state
        r0 = _closure(adj2[0] + eye, n_sq)
        # sever live layer-1 edges crossing layer-0 components
        cross1 = adj2[1] * (1.0 - r0)
        a1 = adj2[1] - cross1
        r1 = _closure(a1 + eye, n_sq)
        cross0 = adj2[0] * (1.0 - r1)
        a0 = adj2[0] - cross0
        changed = (jnp.max(cross0) > 0) | (jnp.max(cross1) > 0)
        return jnp.stack([a0, a1]), changed

    adj, _ = jax.lax.while_loop(
        lambda s: s[1], body, body((adj, jnp.bool_(True)))
    )
    r0 = _closure(adj[0] + eye, n_sq)
    alive_f = alive.astype(jnp.float32)
    comp_size = r0 @ alive_f
    rank = jnp.max(jnp.where(alive, comp_size, 0.0)).astype(jnp.int32)
    # labels = min reachable node index (sentinel for dead nodes)
    iota = jnp.arange(pad_n, dtype=jnp.int32)
    labels = jnp.min(
        jnp.where(r0 > 0, iota[None, :], _BIG), axis=1
    )
    labels = jnp.where(alive, labels, _BIG)
    # map the dense live matrix back to the edge-list sever mask: an edge is
    # (newly) severed iff it was live on entry and is no longer live densely
    live_dense = jax.vmap(lambda a, s, d: a[s, d] > 0)(adj, g.src, g.dst)
    new_sever = sever | (live0 & ~live_dense)
    le = g.edge_mask & ~new_sever & ep
    return CascadeResult(rank=rank, sever=new_sever, labels=labels, live_edge=le)


def cascade(g: DuplexGraph, covered: jnp.ndarray, sever: jnp.ndarray) -> CascadeResult:
    """Run the mutually-connected-component cascade.

    Args:
      g: unbatched padded DuplexGraph.
      covered: bool[N] removed-node mask.
      sever: bool[2, E] previously severed directed-edge mask (persistent state,
        reference: mvc_env.py remove_edge threading).

    Matches Mcc.MCC + find_max_set_length (Mcc.py:30-38,12-13) on the graph induced
    by uncovered nodes.  Small (training-size) graphs take the dense-reachability
    MXU path; larger pads use per-edge min-label propagation.
    """
    pad_n = g.pad_n
    if pad_n <= _DENSE_CASCADE_MAX_N:
        return _dense_cascade(g, covered, sever)
    alive = g.node_mask & ~covered

    def live(sev):
        ep = ~covered[g.src] & ~covered[g.dst]
        return g.edge_mask & ~sev & ep

    def body(state):
        sev, _ = state
        le = live(sev)
        lab0 = _cc_labels(alive, g.src[0], g.dst[0], le[0], pad_n)
        # sever live layer-1 edges crossing layer-0 components
        cross1 = le[1] & (lab0[g.src[1]] != lab0[g.dst[1]])
        sev = sev.at[1].set(sev[1] | cross1)
        le = live(sev)
        lab1 = _cc_labels(alive, g.src[1], g.dst[1], le[1], pad_n)
        cross0 = le[0] & (lab1[g.src[0]] != lab1[g.dst[0]])
        sev = sev.at[0].set(sev[0] | cross0)
        changed = jnp.any(cross0) | jnp.any(cross1)
        return sev, changed

    def cond(state):
        return state[1]

    sever, _ = jax.lax.while_loop(cond, body, body((sever, jnp.bool_(True))))
    le = live(sever)
    labels = _cc_labels(alive, g.src[0], g.dst[0], le[0], pad_n)
    # component sizes: count alive nodes per label
    sizes = jnp.zeros(pad_n, jnp.int32).at[
        jnp.clip(labels, 0, pad_n - 1)
    ].add(jnp.where(alive, 1, 0))
    rank = jnp.max(sizes)
    return CascadeResult(rank=rank, sever=sever, labels=labels, live_edge=le)


@jax.jit
def cascade_from_scratch(g: DuplexGraph, covered: jnp.ndarray) -> CascadeResult:
    """Cascade computed from only the covered set (no prior sever state).

    The resulting *live* edge set (and hence rank/terminality) matches any
    incremental trajectory reaching this covered set; the severed mask itself may
    be a subset of the incremental record (see module docstring).
    """
    sever0 = jnp.zeros_like(g.edge_mask)
    return cascade(g, covered, sever0)


def intact_max_rank(g: DuplexGraph) -> jnp.ndarray:
    """LMCC of the intact graph (reference: graph.py ori_rank :44-47)."""
    covered = jnp.zeros(g.pad_n, bool)
    return _jitted_intact(g, covered)


@jax.jit
def _jitted_intact(g, covered):
    return cascade(g, covered, jnp.zeros_like(g.edge_mask)).rank


@jax.jit
def batched_intact_max_rank(g_batch) -> jnp.ndarray:
    """Intact LMCCs for a stacked graph batch in one call: int32[B]."""
    return jax.vmap(
        lambda g: cascade(
            g, jnp.zeros(g.node_mask.shape[-1], bool), jnp.zeros_like(g.edge_mask)
        ).rank
    )(g_batch)
