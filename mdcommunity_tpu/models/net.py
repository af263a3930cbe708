"""The duplex dismantling Q-network, batched and mask-based.

Re-derivation of the reference model family (MultiDismantler_net_graphsage.py):
per duplex layer, 3 rounds of GraphSAGE-style message passing with a per-graph
virtual node, cross-layer fusion (BitwiseMultipyLogis), then a bilinear
state-action Q head with a learned per-layer softmax gate.  The reference runs
on one block-diagonal compacted batch graph; here everything is [B, N] padded
with dead nodes masked (their embeddings are exactly zero, so they vanish from
sums — no renumbering, fully jit/vmap-able).

Math map (reference file:line):
  input           x_l = deg/maxdeg duplicated         net :102-111
  embed init      H0 = l2n(relu(x @ w_n2l))           net :113-130
  virtual init    Y0 = l2n(relu([1,1] @ w_n2l))       net :121-136
  rounds (×3)     pool = A_l @ H                      net :139-140  (spmm)
                  H' = l2n(relu([pool@c1 ; H@c2]@c3)) net :143-159
                  ypool = Σ_active H                  net :146-150  (subgsum spmm)
                  Y' = l2n(relu([ypool@c1; Y@c2]@c3)) net :150-169
  fusion          BitwiseMultipyLogis over node+virtual rows, then l2n
                                                      net :176-186, MRGNN :252-301
  Q (train)       e = H_f[l][b, a] * (Y_f[l][b]·cross) net :199-212
                  q_l = [relu(e@h1) ; aux_l] @ h2      net :216-235
                  gate_l = relu(Y_f[l]@W1)@W2, softmax net :234-238
  Q (test)        same per node with Y broadcast       net :343-393

Parameter count identical to the reference: 31,205 for the 2-feature variants
(log line "Total number of MultiDismantler_net parameters", CE: 31,269 with the
3-dim input widening w_n2l to [3,64]).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mdcommunity_tpu.env.batch import BatchInputs
from mdcommunity_tpu.graphs.duplex import DuplexGraph
from mdcommunity_tpu.models.fusion import FUSION_INITS, fuse
from mdcommunity_tpu.ops.aggregate import l2_normalize, segment_spmm

Params = Dict[str, jnp.ndarray]


def _trunc_normal(key, shape, std):
    """fmod(normal(0, std), 2): the reference's initializer (net :30)."""
    return jnp.fmod(jax.random.normal(key, shape) * std, 2.0).astype(jnp.float32)


def init_params(
    key,
    embedding_size: int = 64,
    reg_hidden: int = 32,
    aux_dim: int = 4,
    node_feat_dim: int = 2,
    gate_hidden: int = 128,
    w_init_std: float = 1.0,
    fusion: str = "bitwise_logis",
) -> Params:
    ks = jax.random.split(key, 10)
    d = embedding_size
    p: Params = {
        "w_n2l": _trunc_normal(ks[0], (node_feat_dim, d), w_init_std),
        "p_node_conv": _trunc_normal(ks[1], (d, d), w_init_std),
        "p_node_conv2": _trunc_normal(ks[2], (d, d), w_init_std),
        "p_node_conv3": _trunc_normal(ks[3], (2 * d, d), w_init_std),
        "h1_weight": _trunc_normal(ks[4], (d, reg_hidden), w_init_std),
        "h2_weight": _trunc_normal(ks[5], (reg_hidden + aux_dim, 1), w_init_std),
        "cross_product": _trunc_normal(ks[6], (d, 1), w_init_std),
        "w_layer1": _trunc_normal(ks[7], (d, gate_hidden), w_init_std),
        "w_layer2": _trunc_normal(ks[8], (gate_hidden, 1), w_init_std),
        "fusion": FUSION_INITS[fusion](ks[9], d),
    }
    return p


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def _aggregate(g: DuplexGraph, inputs: BatchInputs, layer: int, h: jnp.ndarray):
    """Live-adjacency SpMM for one duplex layer: [B, N, D] -> [B, N, D]."""
    if inputs.adj is not None:
        return jnp.einsum(
            "bij,bjd->bid", inputs.adj[:, layer], h, preferred_element_type=jnp.float32
        )
    return jax.vmap(
        lambda s, d_, w, hh: segment_spmm(s, d_, w, hh, hh.shape[0])
    )(g.src[:, layer], g.dst[:, layer], inputs.live_w[:, layer], h)


def make_blocked_aggregate(bd, interpret: bool = None):
    """Aggregate function over a BlockedDuplex: the graph's edge arrays are in
    pair-slot order, so per-layer live weights reshape straight into the
    blocked-pair Pallas kernel's w[P, T] operand (graphs/blocked.py).
    interpret=None auto-selects the Pallas interpreter off-TPU."""
    from mdcommunity_tpu.ops.pallas_spmm import spmm_block

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    def agg(g, inputs, layer, h):
        bcoo = bd.bcoo[layer]
        w = inputs.live_w[0, layer, : bcoo.n_slots].reshape(
            bcoo.n_pairs, bcoo.T
        )
        return spmm_block(bcoo, w, h[0], interpret=interpret)[None]

    return agg


def _embed(params: Params, g: DuplexGraph, inputs: BatchInputs, max_bp_iter: int,
           aggregate_fn=None):
    """Run per-layer message passing + fusion.

    Returns (H_fused [2, B, N, D], Y_fused [2, B, D]) — l2-normalized.
    """
    node_embs = []
    virt_embs = []
    # virtual-node input: ones on the two degree channels, zero on any extra
    # prior channel (reference: unit/degree y_node_input = ones[2]; CE =
    # [1, 1, 0], CEMultiDismantler/MultiDismantler_net_graphsage.py:102-108)
    f_dim = inputs.node_input.shape[-1]
    ones_feat = jnp.concatenate(
        [jnp.ones((2,), jnp.float32), jnp.zeros((f_dim - 2,), jnp.float32)]
    )
    for l in range(2):
        x = inputs.node_input[:, l]  # [B, N, F]
        h = l2_normalize(jax.nn.relu(x @ params["w_n2l"]))
        y = l2_normalize(jax.nn.relu(ones_feat @ params["w_n2l"]))  # [D]
        y = jnp.broadcast_to(y, (x.shape[0], y.shape[-1]))  # [B, D]
        for _ in range(max_bp_iter):
            pool = (aggregate_fn or _aggregate)(g, inputs, l, h)
            h_new = jnp.concatenate(
                [pool @ params["p_node_conv"], h @ params["p_node_conv2"]], axis=-1
            )
            ypool = jnp.sum(h, axis=1)  # inactive rows are exactly 0
            y_new = jnp.concatenate(
                [ypool @ params["p_node_conv"], y @ params["p_node_conv2"]], axis=-1
            )
            h = l2_normalize(jax.nn.relu(h_new @ params["p_node_conv3"]))
            y = l2_normalize(jax.nn.relu(y_new @ params["p_node_conv3"]))
        node_embs.append(h)
        virt_embs.append(y)

    # cross-layer fusion over node rows and virtual rows (row-wise module)
    h0, h1 = fuse(params["fusion"], node_embs[0], node_embs[1])
    y0, y1 = fuse(params["fusion"], virt_embs[0], virt_embs[1])
    h_f = jnp.stack([l2_normalize(h0), l2_normalize(h1)])  # [2, B, N, D]
    y_f = jnp.stack([l2_normalize(y0), l2_normalize(y1)])  # [2, B, D]
    # keep dead nodes exactly zero after fusion (tanh bias can leak otherwise)
    h_f = h_f * inputs.active[None, :, :, None]
    return h_f, y_f


def _gate(params: Params, y_f: jnp.ndarray) -> jnp.ndarray:
    """Per-layer softmax gate from virtual embeddings: [2, B] (net :234-238)."""
    s = jax.nn.relu(y_f @ params["w_layer1"]) @ params["w_layer2"]  # [2, B, 1]
    return jax.nn.softmax(s[..., 0], axis=0)


def _q_head(params: Params, embed_sa: jnp.ndarray, aux_l: jnp.ndarray) -> jnp.ndarray:
    """[..., D] state-action embedding + [..., aux] -> scalar q [...]."""
    hidden = jax.nn.relu(embed_sa @ params["h1_weight"])
    last = jnp.concatenate([hidden, aux_l], axis=-1)
    return (last @ params["h2_weight"])[..., 0]


def train_forward(
    params: Params,
    g: DuplexGraph,
    inputs: BatchInputs,
    actions: jnp.ndarray,
    max_bp_iter: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Q(s, a) for chosen actions.  Returns (q [B], H_fused [2, B, N, D])."""
    h_f, y_f = _embed(params, g, inputs, max_bp_iter)
    b = jnp.arange(actions.shape[0])
    q_layers = []
    for l in range(2):
        a_embed = h_f[l][b, actions]                     # [B, D]
        scal = y_f[l] @ params["cross_product"]          # [B, 1]
        embed_sa = a_embed * scal                        # [B, D]
        q_layers.append(_q_head(params, embed_sa, inputs.aux[:, l]))
    w = _gate(params, y_f)                               # [2, B]
    q = w[0] * q_layers[0] + w[1] * q_layers[1]
    return q, h_f


def test_forward(
    params: Params,
    g: DuplexGraph,
    inputs: BatchInputs,
    max_bp_iter: int = 3,
    aggregate_fn=None,
) -> jnp.ndarray:
    """Q(s, ·) for every node: [B, N]; dead nodes get -inf."""
    h_f, y_f = _embed(params, g, inputs, max_bp_iter, aggregate_fn)
    q_layers = []
    for l in range(2):
        scal = y_f[l] @ params["cross_product"]          # [B, 1]
        embed_sa = h_f[l] * scal[:, None, :]             # [B, N, D]
        aux_l = jnp.broadcast_to(
            inputs.aux[:, None, l, :], (h_f.shape[1], h_f.shape[2], inputs.aux.shape[-1])
        )
        q_layers.append(_q_head(params, embed_sa, aux_l))  # [B, N]
    w = _gate(params, y_f)                               # [2, B]
    q = w[0][:, None] * q_layers[0] + w[1][:, None] * q_layers[1]
    return jnp.where(inputs.active, q, -jnp.inf)


def laplacian_regularizer(
    h_f: jnp.ndarray, g: DuplexGraph, inputs: BatchInputs, aggregate_fn=None
) -> jnp.ndarray:
    """Σ_l 2·tr(HᵀLH)/|E_l| with L = D - A of the live subgraph, summed over the
    batch as one block-diagonal graph (reference: calc_loss,
    MultiDismantler_torch.py:410-431).

    tr(HᵀLH) = Σ_v deg_v·||H_v||² - Σ_{(u,v) directed} H_u·H_v.
    aggregate_fn overrides the edge-list SpMM (banded / sharded engines).
    """
    total = 0.0
    for l in range(2):
        h = h_f[l]                                       # [B, N, D]
        deg = inputs.deg[:, l]                           # [B, N]
        quad = jnp.sum(deg * jnp.sum(h * h, axis=-1))
        ah = (aggregate_fn or _aggregate)(g, inputs, l, h)
        cross = jnp.sum(h * ah)
        denom = jnp.maximum(jnp.sum(inputs.n_dir_live[:, l]), 1.0)
        total = total + 2.0 * (quad - cross) / denom
    return total


# ---------------------------------------------------------------------------
# banded large-graph forward (dense-band aggregation, jitted end-to-end)
# ---------------------------------------------------------------------------

def _banded_inputs(
    bdx, covered: jnp.ndarray, variant: str, mesh=None
) -> BatchInputs:
    """BatchInputs (B=1) for a BandedDuplex + covered mask.

    Degrees and edge counts come from dense-band unit passes instead of
    per-edge segment ops (feature parity with env/batch.py _single_inputs;
    the severed-edge record lives in the band base itself, so the
    covered-edge aux counter is U - L: unsevered minus live edges).

    mesh: when given, the degree passes run through the gp-sharded
    halo-exchange engine (parallel/band_partition.spmm_band_sharded) so the
    whole forward stays node-sharded; the scalar reductions (maxdeg, edge
    counters) become XLA all-reduces."""
    if mesh is not None:
        from functools import partial as _partial

        from mdcommunity_tpu.parallel.band_partition import spmm_band_sharded

        spmm_dense_band = _partial(spmm_band_sharded, mesh)
    else:
        from mdcommunity_tpu.ops.dense_band import spmm_dense_band

    pad_n = bdx.pad_n
    live = (~covered) & bdx.node_mask
    livef = live.astype(jnp.float32)
    maskf = bdx.node_mask.astype(jnp.float32)
    ones = jnp.ones((pad_n,), jnp.float32)

    degs, counters, n_dir_live = [], [], []
    for l in range(2):
        dbg = bdx.dbg(l)
        # ONE unit-scale pass computes both degree vectors: the band base
        # dominates the pass's HBM traffic (it is re-read whole regardless of
        # D), so folding the liveness masks into a [pad_n, 2] rhs and scaling
        # rows afterwards halves the degree-pass base traffic vs two D=1
        # calls with rank-1 scales.
        both = spmm_dense_band(
            dbg, ones, ones, jnp.stack([livef, maskf], axis=-1)
        )
        deg = both[:, 0] * livef
        deg_u = both[:, 1] * maskf
        degs.append(deg)
        live_cnt = jnp.sum(deg) / 2.0
        unsevered_cnt = jnp.sum(deg_u) / 2.0
        counters.append(unsevered_cnt - live_cnt)
        n_dir_live.append(2.0 * live_cnt)
    deg = jnp.stack(degs)  # [2, N]
    active = live & (deg[0] > 0)

    if variant == "degree_cost":
        base = jnp.stack([bdx.weights, jnp.ones_like(bdx.weights)], axis=-1)
        node_input = jnp.where(active[None, :, None], base, 0.0)
    else:
        maxdeg = jnp.max(jnp.where(active[None, :], deg, 0.0), axis=1)
        nd = deg / jnp.maximum(maxdeg, 1e-12)[:, None]
        nd = jnp.where(active[None, :], nd, 0.0)
        feats = [nd, nd]
        if variant == "ce":
            feats.append(jnp.where(active[None, :], bdx.node_feat, 0.0))
        node_input = jnp.stack(feats, axis=-1)

    n_f = bdx.n_nodes.astype(jnp.float32)
    cov_frac = jnp.sum(covered & bdx.node_mask) / n_f
    e_cnt = jnp.maximum(bdx.n_edges, 1.0)
    wedges = jnp.sum(deg * (deg - 1.0) / 2.0, axis=1)
    aux = jnp.stack(
        [
            jnp.full((2,), cov_frac),
            jnp.stack(counters) / e_cnt,
            wedges / (n_f * n_f),
            jnp.ones((2,)),
        ],
        axis=-1,
    )
    return BatchInputs(
        adj=None,
        live_w=jnp.zeros((1, 2, 1), jnp.float32),
        deg=deg[None],
        active=active[None],
        node_input=node_input[None],
        aux=aux[None],
        n_dir_live=jnp.stack(n_dir_live)[None],
    )


def banded_test_forward(
    params: Params,
    bdx,
    covered: jnp.ndarray,
    variant: str = "unit_cost",
    max_bp_iter: int = 3,
    precise: bool = False,
) -> jnp.ndarray:
    """Q(s, ·) over all nodes of a BandedDuplex: [N]; dead nodes -inf.

    Jit this with static (variant, max_bp_iter, precise); bdx and covered are
    traced arguments, so per-step sever edits and covered updates never
    retrace."""
    inputs = _banded_inputs(bdx, covered, variant)
    live = ((~covered) & bdx.node_mask).astype(jnp.float32)

    def agg(_g, _inputs, layer, h):
        from mdcommunity_tpu.ops.dense_band import spmm_dense_band

        return spmm_dense_band(bdx.dbg(layer), live, live, h[0], precise)[None]

    return test_forward(params, None, inputs, max_bp_iter, aggregate_fn=agg)[0]


def banded_train_loss(
    params: Params,
    bdx,
    covered: jnp.ndarray,
    actions: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.001,
    variant: str = "unit_cost",
    max_bp_iter: int = 3,
    precise: bool = False,
    mesh=None,
    remat: bool = False,
) -> jnp.ndarray:
    """DQN loss on ONE large BandedDuplex: MSE(Q[actions], targets) +
    alpha·Laplacian embedding regularizer — the banded-engine analogue of the
    reference training loss (calc_loss, MultiDismantler_torch.py:410-431),
    differentiable in `params` through the band engine.

    mesh: gp-sharded multi-chip training — every aggregation (the three
    message-passing rounds, the degree passes, and the regularizer's A·H
    pass) runs through parallel/band_partition.spmm_band_sharded (ppermute
    halos + mirror all_gather); the scalar loss reduces over the mesh, so
    jax.grad under the same mesh yields replicated parameter gradients.
    Verified against the single-device engine in __graft_entry__
    .dryrun_multichip (grad parity).

    remat: rematerialize the embedding under jax.checkpoint — the backward
    pass recomputes the message-passing rounds instead of storing their
    [pad_n, D] activations.  At 2^20 nodes the stored residuals of ~8
    windowed aggregation passes exceed the v5e's HBM next to the resident
    band operands (the 10^6-node fit OOMed without this); the aggregations
    are DMA-bound, so the recompute costs far less than it frees."""
    inputs = _banded_inputs(bdx, covered, variant, mesh=mesh)
    live = ((~covered) & bdx.node_mask).astype(jnp.float32)

    if mesh is not None:
        from functools import partial as _partial

        from mdcommunity_tpu.parallel.band_partition import spmm_band_sharded

        spmm = _partial(spmm_band_sharded, mesh)
    else:
        from mdcommunity_tpu.ops.dense_band import spmm_dense_band as spmm

    def agg(_g, _inputs, layer, h):
        return spmm(bdx.dbg(layer), live, live, h[0], precise)[None]

    def embed_fn(p):
        return _embed(p, None, inputs, max_bp_iter, aggregate_fn=agg)

    if remat:
        embed_fn = jax.checkpoint(embed_fn)
    h_f, y_f = embed_fn(params)
    q_layers = []
    for l in range(2):
        scal = y_f[l] @ params["cross_product"]          # [1, 1]
        embed_sa = h_f[l][0, actions] * scal             # [K, D]
        aux_l = jnp.broadcast_to(
            inputs.aux[0, l], (actions.shape[0], inputs.aux.shape[-1])
        )
        q_layers.append(_q_head(params, embed_sa, aux_l))  # [K]
    w = _gate(params, y_f)                               # [2, 1]
    q = w[0] * q_layers[0] + w[1] * q_layers[1]
    mse = jnp.mean(jnp.square(q - targets))
    reg = laplacian_regularizer(h_f, None, inputs, aggregate_fn=agg)
    return mse + alpha * reg
