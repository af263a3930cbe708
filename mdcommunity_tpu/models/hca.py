"""HCA-Dismantler: hierarchical community-aware Q-network, batched and masked.

Reference: HCA-Dismantler/MultiDismantler_net_graphsage.py (train_forward
:112-305).  Differences from the base model:

  * input = static HCA node features [f_het, f_impact, f_roi] ([N, 3], shared
    by both layers), with a cross-layer heterogeneity bias
    h_l += 5·f_het·h_other before message passing (:160-166)
  * virtual nodes are COMMUNITIES (Louvain per layer), pooled with
    f_roi + 1e-6 weights (HCA PrepareBatchGraph.subg_construct :442-473)
  * a macro community-GCN after the micro/meso rounds:
    Y = l2n(relu((A_comm @ Y) @ w_macro)) with A_comm built from live
    inter-community edges + self loops (comm_adj_construct :491-541)
  * cross-layer fusion (BitwiseMultipyLogis) over node+community rows,
    WITHOUT the base net's post-fusion re-normalization (:208-222)
  * divide-and-conquer decoder: per-layer community scores vs the mean
    community embedding, top-30% community mask projected to nodes through the
    membership matrix, node Q = [h_u ; f_roi·h_comm(u)] @ w_micro_score with
    unselected nodes at -1e9 (:234-278); per-layer softmax gate from the mean
    community embedding (:283-295)
  * the aux features and the base Q head (h1/h2/cross_product) are unused.

Deliberate deviations (documented): the reference computes the decoder's mean /
top-k over ALL communities of a training minibatch jointly (information leaks
across unrelated graphs); we compute them per graph, which coincides for the
B=1 evaluation path.  active nodes = all uncovered nodes (HCA keeps isolated
survivors, PrepareBatchGraph :49-58).

Reference-bug note (intent implemented, bug not replicated): the reference
populates community membership BEFORE sequential node indices are assigned —
at that point get_status_info has set idx_map to 0 for every uncovered node
(PrepareBatchGraph.py:53-57), so `global_node_id = curr_node_cnt + idx_map[u]`
collapses every member of every community onto node 0 (:178-200 vs the
reassignment at :227-232).  The degenerate membership matrix would pool only
node 0's embedding into each community; we build the true membership the
surrounding code and paper clearly intend.  Similarly, the bridge-reward gate
compares against an f_het value that is never updated after construction
(mvc_env.py:294-297) — see Config.hca_bridge_effective for both semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from mdcommunity_tpu.graphs.duplex import DuplexGraph
from mdcommunity_tpu.models.fusion import bitwise_logis_fuse, init_bitwise_logis
from mdcommunity_tpu.models.net import _trunc_normal
from mdcommunity_tpu.ops.aggregate import dense_adjacency, l2_normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HcaInputs:
    """Operands for a batch of HCA states (leading dim B).

    adj        : f32[B, 2, N, N]   live adjacency
    member     : f32[B, 2, C, N]   f_roi-weighted community membership (active)
    comm_adj   : f32[B, 2, C, C]   live community graph + self loops
    comm_real  : bool[B, 2, C]     community index < n_comms
    active     : bool[B, N]        uncovered nodes
    node_input : f32[B, N, 3]      masked HCA features
    deg        : f32[B, 2, N]      live degrees (Laplacian loss)
    n_dir_live : f32[B, 2]
    """

    adj: jnp.ndarray
    member: jnp.ndarray
    comm_adj: jnp.ndarray
    comm_real: jnp.ndarray
    active: jnp.ndarray
    node_input: jnp.ndarray
    deg: jnp.ndarray
    n_dir_live: jnp.ndarray


def _single_hca_inputs(g: DuplexGraph, covered, sever, c_pad: int) -> HcaInputs:
    pad_n = g.pad_n
    ep_alive = ~covered[g.src] & ~covered[g.dst]
    live = g.edge_mask & ~sever & ep_alive
    w = live.astype(jnp.float32)
    deg = jax.vmap(lambda s, m: jnp.zeros(pad_n).at[s].add(m))(g.src, w)
    active = (~covered) & g.node_mask

    adj = jax.vmap(lambda s, d, ww: dense_adjacency(s, d, ww, pad_n))(g.src, g.dst, w)

    f_roi = g.hca_feat[:, 2]
    member_w = jnp.where(active, f_roi + 1e-6, 0.0)  # [N]
    comm_ids = jnp.clip(g.comm_id, 0, c_pad - 1)      # [2, N]

    def layer_member(cid_l):
        m = jnp.zeros((c_pad, pad_n))
        return m.at[cid_l, jnp.arange(pad_n)].add(member_w)

    member = jax.vmap(layer_member)(comm_ids)  # [2, C, N]

    comm_real = (
        jnp.arange(c_pad)[None, :] < g.n_comms[:, None]
    )  # [2, C]

    def layer_comm_adj(cid_l, s, d, ww, real_l):
        # live inter-community edges (binarized) + self loops for real comms
        a = jnp.zeros((c_pad, c_pad)).at[cid_l[d], cid_l[s]].add(ww)
        a = (a > 0).astype(jnp.float32)
        eye = jnp.eye(c_pad)
        return a * (1.0 - eye) + eye * real_l.astype(jnp.float32)

    comm_adj = jax.vmap(layer_comm_adj)(comm_ids, g.src, g.dst, w, comm_real)

    node_input = jnp.where(active[:, None], g.hca_feat, 0.0)

    return HcaInputs(
        adj=adj,
        member=member,
        comm_adj=comm_adj,
        comm_real=comm_real,
        active=active,
        node_input=node_input,
        deg=deg,
        n_dir_live=jnp.sum(w, axis=1),
    )


def make_hca_inputs(g: DuplexGraph, covered, sever, c_pad: int) -> HcaInputs:
    return jax.vmap(lambda gg, c, s: _single_hca_inputs(gg, c, s, c_pad))(
        g, covered, sever
    )


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_hca_params(key, embedding_size: int = 64, reg_hidden: int = 32,
                    aux_dim: int = 4, gate_hidden: int = 128,
                    w_init_std: float = 1.0) -> Dict:
    """Base params (3-dim input) + HCA heads (w_macro, w_comm_score,
    w_micro_score).  h1/h2/cross_product retained for checkpoint-shape parity
    though unused on the forward path (HCA net keeps them too)."""
    from mdcommunity_tpu.models.net import init_params

    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = init_params(
        k1, embedding_size=embedding_size, reg_hidden=reg_hidden,
        aux_dim=aux_dim, node_feat_dim=3, gate_hidden=gate_hidden,
        w_init_std=w_init_std,
    )
    d = embedding_size
    p["w_macro"] = _trunc_normal(k2, (d, d), w_init_std)
    p["w_comm_score"] = _trunc_normal(k3, (2 * d, 1), w_init_std)
    p["w_micro_score"] = _trunc_normal(k4, (2 * d, 1), w_init_std)
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def hca_forward(
    params: Dict,
    g: DuplexGraph,
    inputs: HcaInputs,
    max_bp_iter: int = 3,
    top_frac: float = 0.3,
    ref_quirks: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Q over all nodes.  Returns (q_all [B, N] with -inf at dead nodes,
    fused node embeddings [2, B, N, D] for the Laplacian loss).

    ref_quirks=True replicates the reference net's layer-gate quirk for
    exact-parity testing: its gate averages `node_embedding[l][nodes_cnt:]`
    (HCA net :283-295) — ALL max_comm_size post-fusion community rows
    INCLUDING the zero-padding appended for the smaller layer (which fusion
    has made non-zero), i.e. sum over c_pad rows / c_pad — while the decoder
    correctly averages only the layer's real communities (:234-237).  The
    default computes both means over real communities."""
    b, n = inputs.active.shape
    c_pad = inputs.member.shape[2]
    d = params["w_n2l"].shape[1]

    h0 = l2_normalize(jax.nn.relu(inputs.node_input @ params["w_n2l"]))  # [B,N,D]
    f_het = inputs.node_input[..., 0:1]                                   # [B,N,1]
    y0 = l2_normalize(jax.nn.relu(jnp.ones((3,)) @ params["w_n2l"]))      # [D]

    node_embs, comm_embs = [], []
    for l in range(2):
        # cross-layer heterogeneity bias (both layers share h0 pre-rounds)
        h = h0 + 5.0 * f_het * h0
        y = jnp.broadcast_to(y0, (b, c_pad, d))
        for _ in range(max_bp_iter):
            pool = jnp.einsum("bij,bjd->bid", inputs.adj[:, l], h,
                              preferred_element_type=jnp.float32)
            ypool = jnp.einsum("bcj,bjd->bcd", inputs.member[:, l], h,
                               preferred_element_type=jnp.float32)
            h_new = jnp.concatenate(
                [pool @ params["p_node_conv"], h @ params["p_node_conv2"]], -1
            )
            y_new = jnp.concatenate(
                [ypool @ params["p_node_conv"], y @ params["p_node_conv2"]], -1
            )
            h = l2_normalize(jax.nn.relu(h_new @ params["p_node_conv3"]))
            y = l2_normalize(jax.nn.relu(y_new @ params["p_node_conv3"]))
        # macro community GCN
        agg = jnp.einsum("bce,bed->bcd", inputs.comm_adj[:, l], y,
                         preferred_element_type=jnp.float32)
        y = l2_normalize(jax.nn.relu(agg @ params["w_macro"]))
        node_embs.append(h)
        comm_embs.append(y)

    # cross-layer fusion (no post-normalization in the HCA net)
    hf0, hf1 = bitwise_logis_fuse(params["fusion"], node_embs[0], node_embs[1])
    yf0, yf1 = bitwise_logis_fuse(params["fusion"], comm_embs[0], comm_embs[1])
    h_f = jnp.stack([hf0, hf1]) * inputs.active[None, :, :, None]
    y_f = jnp.stack([yf0, yf1])  # [2, B, C, D]

    q_layers, gates = [], []
    for l in range(2):
        y = y_f[l]                                    # [B, C, D]
        real = inputs.comm_real[:, l]                 # [B, C]
        n_real = jnp.maximum(jnp.sum(real, axis=1), 1)  # [B]
        y_masked = y * real[..., None]
        h_global = jnp.sum(y_masked, axis=1) / n_real[:, None].astype(jnp.float32)
        score_in = jnp.concatenate(
            [y, jnp.broadcast_to(h_global[:, None, :], y.shape)], -1
        )
        scores = (score_in @ params["w_comm_score"])[..., 0]   # [B, C]
        scores = jnp.where(real, scores, -jnp.inf)
        k_top = jnp.maximum(1, (n_real.astype(jnp.float32) * top_frac).astype(jnp.int32))
        order = jnp.argsort(-scores, axis=1)
        rank = jnp.zeros_like(order).at[
            jnp.arange(b)[:, None], order
        ].set(jnp.broadcast_to(jnp.arange(c_pad)[None, :], (b, c_pad)))
        comm_mask = (rank < k_top[:, None]) & real     # [B, C]

        member = inputs.member[:, l]                   # [B, C, N]
        node_sel = jnp.einsum("bcn,bc->bn", member, comm_mask.astype(jnp.float32))
        h_comm_b = jnp.einsum("bcn,bcd->bnd", member, y)  # f_roi-weighted broadcast
        q_in = jnp.concatenate([h_f[l], h_comm_b], -1)
        q_raw = (q_in @ params["w_micro_score"])[..., 0]   # [B, N]
        q_l = jnp.where(node_sel > 0, q_raw, -1e9)
        q_layers.append(q_l)

        if ref_quirks:
            # reference gate: mean over ALL c_pad post-fusion rows (padding
            # included), HCA net :283-295
            gate_in = jnp.sum(y, axis=1) / float(c_pad)
        else:
            gate_in = h_global                          # per-graph mean comm emb
        gates.append(
            (jax.nn.relu(gate_in @ params["w_layer1"]) @ params["w_layer2"])[..., 0]
        )

    wsm = jax.nn.softmax(jnp.stack(gates), axis=0)      # [2, B]
    q_all = wsm[0][:, None] * q_layers[0] + wsm[1][:, None] * q_layers[1]
    q_all = jnp.where(inputs.active, q_all, -jnp.inf)
    return q_all, h_f


def hca_laplacian(h_f, g: DuplexGraph, inputs: HcaInputs) -> jnp.ndarray:
    """Same Laplacian embedding regularizer as the base trainer, over live
    subgraphs (HCA calc_loss mirrors the base)."""
    total = 0.0
    for l in range(2):
        h = h_f[l]
        deg = inputs.deg[:, l]
        quad = jnp.sum(deg * jnp.sum(h * h, axis=-1))
        ah = jnp.einsum("bij,bjd->bid", inputs.adj[:, l], h,
                        preferred_element_type=jnp.float32)
        cross = jnp.sum(h * ah)
        denom = jnp.maximum(jnp.sum(inputs.n_dir_live[:, l]), 1.0)
        total = total + 2.0 * (quad - cross) / denom
    return total
