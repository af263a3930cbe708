"""HCA-Dismantler large-graph forward: banded aggregation + segment-sum
community pooling.

The dense HCA path (models/hca.py make_hca_inputs) materializes [2, N, N]
adjacency and [2, C, N] membership — O(N²) memory, infeasible at the
reference's 14k–18k-node real datasets (HCA-Dismantler/testReal.py:27-68).
This module computes the same math with large-graph operands:

  * adjacency pooling  adj @ h        -> block-banded dense SpMM
    (ops/dense_band.py) with rank-1 liveness scales — identical engine to
    the base variant's blocked path
  * community pooling  member @ h     -> jax.ops.segment_sum over the
    per-layer community ids with f_roi+1e-6 membership weights (HCA
    PrepareBatchGraph.subg_construct :442-473); the scatter table is
    [c_pad, D] — small — so TPU scatter cost is bounded by the community
    count, not N
  * community graph    comm_adj       -> M^T (A_live M): one band pass with a
    [pad_n, c_pad] one-hot membership rhs, then a segment-sum over dst
    community ids; binarized + self-loops exactly as comm_adj_construct
    (:491-541).  Liveness and cascade severs are inherited from the band
    base + scales, so the community graph tracks dismantling for free
  * decoder broadcast  member^T ops   -> per-node gathers from [c_pad, *]
    tables (comm_mask[cid[u]], y[cid[u]]) — tiny tables, no [C, N] matrix

Numerics match models/hca.hca_forward at B=1 (summation-order rounding
aside); parity is tested in tests/test_hca_banded.py.  Eval wiring:
eval/real.py routes variant="hca" above blocked_threshold through
dismantle_greedy_banded(hca_data=...).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdcommunity_tpu.models.fusion import bitwise_logis_fuse
from mdcommunity_tpu.ops.aggregate import l2_normalize
from mdcommunity_tpu.ops.dense_band import spmm_dense_band


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HcaBandData:
    """Static HCA node data in BANDED (RCM-permuted, padded) node order.

    comm_id  : int32[2, pad_n] per-layer community index (padding -> 0)
    n_comms  : int32[2]        real community counts
    hca_feat : f32[pad_n, 3]   [f_het, f_impact, f_roi] (padding -> 0)
    """

    comm_id: jnp.ndarray
    n_comms: jnp.ndarray
    hca_feat: jnp.ndarray
    c_pad: int = dataclasses.field(metadata=dict(static=True))


def make_hca_band_data(
    comm_id: np.ndarray,
    n_comms: np.ndarray,
    hca_feat: np.ndarray,
    perm: np.ndarray,
    pad_n: int,
    c_pad: Optional[int] = None,
) -> HcaBandData:
    """Permute the host-computed HCA arrays (graphs/hca.py, original ids,
    length n) into banded order and pad to pad_n.  perm maps banded position
    -> original id (build_banded_duplex's return)."""
    n = len(perm)
    cid = np.zeros((2, pad_n), np.int32)
    cid[:, :n] = np.asarray(comm_id, np.int32)[:, perm]
    feat = np.zeros((pad_n, 3), np.float32)
    feat[:n] = np.asarray(hca_feat, np.float32)[perm]
    if c_pad is None:
        c_pad = 8
        while c_pad < int(np.max(n_comms, initial=1)):
            c_pad *= 2
    return HcaBandData(
        comm_id=jnp.asarray(cid),
        n_comms=jnp.asarray(np.asarray(n_comms, np.int32)),
        hca_feat=jnp.asarray(feat),
        c_pad=int(c_pad),
    )


def banded_hca_forward(
    params: Dict,
    bdx,
    hd: HcaBandData,
    covered: jnp.ndarray,
    max_bp_iter: int = 3,
    top_frac: float = 0.3,
    precise: bool = False,
    ref_quirks: bool = False,
) -> jnp.ndarray:
    """Q(s, ·) over all nodes of a BandedDuplex with HCA heads: [pad_n];
    dead nodes -inf.  Same math as models/hca.hca_forward (B=1) — see that
    module's docstring for the reference line map (HCA net :112-305) and the
    ref_quirks gate semantics.  Jit with static (max_bp_iter, top_frac,
    precise, ref_quirks); bdx/hd/covered are traced, so per-step sever edits
    never retrace."""
    pad_n = bdx.pad_n
    c_pad = hd.c_pad
    d = params["p_node_conv"].shape[0]

    # HCA keeps isolated survivors active (PrepareBatchGraph :49-58)
    active = (~covered) & bdx.node_mask
    live = active.astype(jnp.float32)

    node_input = jnp.where(active[:, None], hd.hca_feat, 0.0)  # [pad_n, 3]
    f_het = node_input[:, 0:1]
    h0 = l2_normalize(jax.nn.relu(node_input @ params["w_n2l"]))
    y0 = l2_normalize(jax.nn.relu(jnp.ones((3,)) @ params["w_n2l"]))  # [D]

    f_roi = hd.hca_feat[:, 2]
    member_w = jnp.where(active, f_roi + 1e-6, 0.0)
    cid = jnp.clip(hd.comm_id, 0, c_pad - 1)  # [2, pad_n]

    node_embs, comm_embs = [], []
    for l in range(2):
        h = h0 + 5.0 * f_het * h0
        y = jnp.broadcast_to(y0, (c_pad, d))
        for _ in range(max_bp_iter):
            pool = spmm_dense_band(bdx.dbg(l), live, live, h, precise)
            ypool = jax.ops.segment_sum(
                member_w[:, None] * h, cid[l], num_segments=c_pad
            )
            h_new = jnp.concatenate(
                [pool @ params["p_node_conv"], h @ params["p_node_conv2"]], -1
            )
            y_new = jnp.concatenate(
                [ypool @ params["p_node_conv"], y @ params["p_node_conv2"]], -1
            )
            h = l2_normalize(jax.nn.relu(h_new @ params["p_node_conv3"]))
            y = l2_normalize(jax.nn.relu(y_new @ params["p_node_conv3"]))

        # community graph: M^T (A_live M), binarize, self-loops for real comms
        real = jnp.arange(c_pad) < hd.n_comms[l]
        m_onehot = (cid[l][:, None] == jnp.arange(c_pad)[None, :]).astype(
            jnp.float32
        )
        am = spmm_dense_band(bdx.dbg(l), live, live, m_onehot, precise)
        a = jax.ops.segment_sum(am, cid[l], num_segments=c_pad)  # [C, C]
        a = (a > 0).astype(jnp.float32)
        eye = jnp.eye(c_pad)
        comm_adj = a * (1.0 - eye) + eye * real.astype(jnp.float32)

        agg = comm_adj @ y
        y = l2_normalize(jax.nn.relu(agg @ params["w_macro"]))
        node_embs.append(h)
        comm_embs.append(y)

    # cross-layer fusion (no post-normalization in the HCA net)
    hf0, hf1 = bitwise_logis_fuse(params["fusion"], node_embs[0], node_embs[1])
    yf0, yf1 = bitwise_logis_fuse(params["fusion"], comm_embs[0], comm_embs[1])
    h_f = jnp.stack([hf0, hf1]) * active[None, :, None]  # [2, pad_n, D]
    y_f = jnp.stack([yf0, yf1])                          # [2, C, D]

    q_layers, gates = [], []
    for l in range(2):
        y = y_f[l]
        real = jnp.arange(c_pad) < hd.n_comms[l]
        n_real = jnp.maximum(jnp.sum(real), 1)
        y_masked = y * real[:, None]
        h_global = jnp.sum(y_masked, axis=0) / n_real.astype(jnp.float32)
        score_in = jnp.concatenate(
            [y, jnp.broadcast_to(h_global[None, :], y.shape)], -1
        )
        scores = (score_in @ params["w_comm_score"])[:, 0]
        scores = jnp.where(real, scores, -jnp.inf)
        k_top = jnp.maximum(
            1, (n_real.astype(jnp.float32) * top_frac).astype(jnp.int32)
        )
        order = jnp.argsort(-scores)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(c_pad))
        comm_mask = (rank < k_top) & real  # [C]

        # member^T ops as per-node gathers from [c_pad, *] tables
        node_sel = member_w * comm_mask.astype(jnp.float32)[cid[l]]
        h_comm_b = member_w[:, None] * y[cid[l]]  # [pad_n, D]
        q_in = jnp.concatenate([h_f[l], h_comm_b], -1)
        q_raw = (q_in @ params["w_micro_score"])[:, 0]
        q_layers.append(jnp.where(node_sel > 0, q_raw, -1e9))

        if ref_quirks:
            gate_in = jnp.sum(y, axis=0) / float(c_pad)
        else:
            gate_in = h_global
        gates.append(
            (jax.nn.relu(gate_in @ params["w_layer1"]) @ params["w_layer2"])[0]
        )

    wsm = jax.nn.softmax(jnp.stack(gates), axis=0)  # [2]
    q_all = wsm[0] * q_layers[0] + wsm[1] * q_layers[1]
    return jnp.where(active, q_all, -jnp.inf)


def banded_hca_forward_packed(
    params: Dict,
    bdx,
    pks,
    hd: HcaBandData,
    covered: jnp.ndarray,
    max_bp_iter: int = 3,
    top_frac: float = 0.3,
    precise: bool = False,
    interpret: bool = None,
) -> jnp.ndarray:
    """banded_hca_forward with the Pallas packed band engine for every
    node-space aggregation and all dense layers in the packed [pad_n/2, 2D]
    node-pair layout (models/net_packed.py's calculus) — the HCA heads'
    first-class packed path.

    Packed-layout mapping of the HCA-specific pieces:
      * heterogeneity bias h += 5·f_het·h  -> lane-parity scalar plane
      * community pooling (segment_sum)    -> member-scale in packed layout,
        ONE unpack reshape feeding the scatter (c_pad-bounded table)
      * community-graph pass M^T(A M)      -> stays on the XLA band engine:
        its rhs is [pad_n, c_pad] (c_pad is data-dependent and can exceed
        the packed kernel's lane budget), and it runs once per layer
      * decoder gathers (comm_mask[cid], y[cid]) -> gathered per node then
        packed for the q head's concat-matmul
    Same math as banded_hca_forward (production semantics; no ref_quirks —
    the quirks replication path stays on the dense engine).  Parity:
    tests/test_hca_banded.py."""
    import jax as _jax

    from mdcommunity_tpu.models.net_packed import (
        _bd,
        _cat_packed,
        _l2n_packed,
        _rep,
    )
    from mdcommunity_tpu.ops.band_pallas import (
        pack_rows,
        scale_packed,
        spmm_band_packed,
        unpack_rows,
    )

    if interpret is None:
        interpret = _jax.default_backend() not in ("tpu", "axon")
    pad_n = bdx.pad_n
    m = pad_n // 2
    c_pad = hd.c_pad
    d = params["p_node_conv"].shape[0]

    active = (~covered) & bdx.node_mask
    live = active.astype(jnp.float32)

    node_input = jnp.where(active[:, None], hd.hca_feat, 0.0)  # [pad_n, 3]
    f_het2 = node_input[:, 0].reshape(m, 2)                    # parity plane
    x2 = node_input.reshape(m, 6)
    w_n2l2 = _bd(params["w_n2l"])
    c1_2, c2_2, c3_2 = (
        _bd(params["p_node_conv"]),
        _bd(params["p_node_conv2"]),
        _bd(params["p_node_conv3"]),
    )
    h0_2 = _l2n_packed(_jax.nn.relu(x2 @ w_n2l2))
    y0 = l2_normalize(_jax.nn.relu(jnp.ones((3,)) @ params["w_n2l"]))  # [D]

    f_roi = hd.hca_feat[:, 2]
    member_w = jnp.where(active, f_roi + 1e-6, 0.0)
    cid = jnp.clip(hd.comm_id, 0, c_pad - 1)  # [2, pad_n]

    node_embs2, comm_embs = [], []
    for l in range(2):
        h2 = h0_2 + 5.0 * _rep(f_het2, d) * h0_2
        y = jnp.broadcast_to(y0, (c_pad, d))
        for _ in range(max_bp_iter):
            pool2 = spmm_band_packed(
                pks[l], bdx.dbg(l), live, live, h2, interpret, precise=precise
            )
            h_mw = unpack_rows(scale_packed(h2, member_w))      # [pad_n, D]
            ypool = jax.ops.segment_sum(h_mw, cid[l], num_segments=c_pad)
            cat2 = _cat_packed(pool2 @ c1_2, h2 @ c2_2)
            y_new = jnp.concatenate(
                [ypool @ params["p_node_conv"], y @ params["p_node_conv2"]], -1
            )
            h2 = _l2n_packed(_jax.nn.relu(cat2 @ c3_2))
            y = l2_normalize(_jax.nn.relu(y_new @ params["p_node_conv3"]))

        # community graph on the XLA band engine (rhs width = c_pad)
        real = jnp.arange(c_pad) < hd.n_comms[l]
        m_onehot = (cid[l][:, None] == jnp.arange(c_pad)[None, :]).astype(
            jnp.float32
        )
        am = spmm_dense_band(bdx.dbg(l), live, live, m_onehot, precise)
        a = jax.ops.segment_sum(am, cid[l], num_segments=c_pad)
        a = (a > 0).astype(jnp.float32)
        eye = jnp.eye(c_pad)
        comm_adj = a * (1.0 - eye) + eye * real.astype(jnp.float32)
        y = l2_normalize(_jax.nn.relu((comm_adj @ y) @ params["w_macro"]))
        node_embs2.append(h2)
        comm_embs.append(y)

    # cross-layer fusion in packed layout (BitwiseMultipyLogis, no post-l2n)
    fp = params["fusion"]
    trans2, bias2 = _bd(fp["trans"]), jnp.concatenate([fp["bias"], fp["bias"]])
    w2 = _bd(fp["logis_w"])

    def fuse2(e_self, e_other):
        f_s = jnp.tanh(e_self @ trans2 + bias2)
        f_o = jnp.tanh(e_other @ trans2 + bias2)
        a_self = _jax.nn.sigmoid(f_s * f_s @ w2 + fp["logis_b"])
        a_other = _jax.nn.sigmoid(f_o * f_s @ w2 + fp["logis_b"])
        w = _jax.nn.softmax(jnp.stack([a_self, a_other], -1), -1)[..., 1]
        return f_s + _rep(w, d) * f_o

    act2 = active.astype(jnp.float32).reshape(m, 2)
    hf2 = [
        fuse2(node_embs2[0], node_embs2[1]) * _rep(act2, d),
        fuse2(node_embs2[1], node_embs2[0]) * _rep(act2, d),
    ]
    yf0, yf1 = bitwise_logis_fuse(params["fusion"], comm_embs[0], comm_embs[1])
    y_f = [yf0, yf1]

    q_layers, gates = [], []
    w_micro2 = _bd(params["w_micro_score"])  # [4D, 2]
    for l in range(2):
        y = y_f[l]
        real = jnp.arange(c_pad) < hd.n_comms[l]
        n_real = jnp.maximum(jnp.sum(real), 1)
        y_masked = y * real[:, None]
        h_global = jnp.sum(y_masked, axis=0) / n_real.astype(jnp.float32)
        score_in = jnp.concatenate(
            [y, jnp.broadcast_to(h_global[None, :], y.shape)], -1
        )
        scores = (score_in @ params["w_comm_score"])[:, 0]
        scores = jnp.where(real, scores, -jnp.inf)
        k_top = jnp.maximum(
            1, (n_real.astype(jnp.float32) * top_frac).astype(jnp.int32)
        )
        order = jnp.argsort(-scores)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(c_pad))
        comm_mask = (rank < k_top) & real

        node_sel = member_w * comm_mask.astype(jnp.float32)[cid[l]]
        h_comm_b2 = scale_packed(pack_rows(y[cid[l]]), member_w)  # [m, 2D]
        q_in2 = _cat_packed(hf2[l], h_comm_b2)                    # [m, 4D]
        q_raw = (q_in2 @ w_micro2).reshape(pad_n)
        q_layers.append(jnp.where(node_sel > 0, q_raw, -1e9))

        gates.append(
            (_jax.nn.relu(h_global @ params["w_layer1"]) @ params["w_layer2"])[0]
        )

    wsm = _jax.nn.softmax(jnp.stack(gates), axis=0)  # [2]
    q_all = wsm[0] * q_layers[0] + wsm[1] * q_layers[1]
    return jnp.where(active, q_all, -jnp.inf)
