"""Packed-layout banded model forward — the large-graph eval path with the
Pallas packed band kernel (ops/band_pallas.py) as the aggregation engine and
EVERY dense layer running in the packed [pad_n/2, 2D] node-pair layout.

Why a whole packed forward instead of pack/unpack around the kernel: a
[pad_n, 64] f32 array is physically 128-lane padded on TPU, so each
pack/unpack is a real HBM relayout (~the cost of an extra h read+write per
aggregation — 12+ per forward).  Packing once at the input and unpacking once
at the Q output keeps the entire forward in the dense layout; as a bonus,
every [*, 64] matmul becomes a [*, 128] matmul against a block-diagonal
weight — the MXU's native shape (K=128 fills the systolic array that D=64
half-fills), so the dense layers get faster, not slower, despite 2x the
nominal FLOPs.

Math is identical to models/net.py `banded_test_forward` (itself pinned to
the reference MultiDismantler_net_graphsage.py:102-393 — see net.py's module
docstring for the line map); parity is tested in tests/test_net_packed.py.

Packed-layout calculus used throughout (m = pad_n // 2, packed row r holds
nodes 2r | 2r+1 in lane halves):

  x @ W            ->  x2 @ blockdiag(W, W)
  concat(a, b) @ W ->  [a_lo | b_lo | a_hi | b_hi] @ blockdiag(W, W)
  l2-normalize     ->  per lane-half rsqrt
  row-wise scalar  ->  [m, 2] lane-parity plane, broadcast by jnp.repeat
  sum over nodes   ->  sum(lo) + sum(hi)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mdcommunity_tpu.models.net import Params, _banded_inputs
from mdcommunity_tpu.ops.aggregate import l2_normalize
from mdcommunity_tpu.ops.band_pallas import PackedBand, spmm_band_packed


def _bd(w: jnp.ndarray) -> jnp.ndarray:
    """[a, b] -> block-diagonal [2a, 2b] = W ⊕ W."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0
    )


def _tile2(v: jnp.ndarray) -> jnp.ndarray:
    """[d] bias -> [2d] for packed rows."""
    return jnp.concatenate([v, v])


def _l2n_packed(x2: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-node L2 normalization in packed layout (lane halves).  Same
    zero-row-safe rsqrt form as ops.aggregate.l2_normalize."""
    d = x2.shape[1] // 2
    lo, hi = x2[:, :d], x2[:, d:]
    nlo = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(lo * lo, -1, keepdims=True), eps * eps)
    )
    nhi = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(hi * hi, -1, keepdims=True), eps * eps)
    )
    return jnp.concatenate([lo * nlo, hi * nhi], 1)


def _cat_packed(a2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Per-node feature concat in packed layout:
    [a_lo | b_lo | a_hi | b_hi], ready for @ _bd(W)."""
    da, db = a2.shape[1] // 2, b2.shape[1] // 2
    return jnp.concatenate(
        [a2[:, :da], b2[:, :db], a2[:, da:], b2[:, db:]], 1
    )


def _rep(s2: jnp.ndarray, d: int) -> jnp.ndarray:
    """Lane-parity scalar plane [m, 2] -> [m, 2d] (each half broadcast)."""
    return jnp.repeat(s2, d, axis=1)


def _fuse_packed(fp, e0_2, e1_2):
    """Cross-layer fusion in packed layout (models/fusion.py semantics:
    BitwiseMultipyLogis when 'logis_w' is present, else the duplex-closed-form
    additive fuse shared by the three attention alternatives)."""
    d = e0_2.shape[1] // 2
    trans2, bias2 = _bd(fp["trans"]), _tile2(fp["bias"])
    f0 = jnp.tanh(e0_2 @ trans2 + bias2)
    f1 = jnp.tanh(e1_2 @ trans2 + bias2)
    if "logis_w" not in fp:
        return f0 + f1, f1 + f0
    w2 = _bd(fp["logis_w"])  # [2D, 2]: lane-parity logistic scores

    def one(fl, fo):
        a_self = jax.nn.sigmoid(fl * fl @ w2 + fp["logis_b"])    # [m, 2]
        a_other = jax.nn.sigmoid(fo * fl @ w2 + fp["logis_b"])   # [m, 2]
        w = jax.nn.softmax(jnp.stack([a_self, a_other], -1), -1)[..., 1]
        return fl + _rep(w, d) * fo

    return one(f0, f1), one(f1, f0)


def banded_test_forward_packed(
    params: Params,
    bdx,
    pks: Sequence[PackedBand],
    covered: jnp.ndarray,
    variant: str = "unit_cost",
    max_bp_iter: int = 3,
    act_dtype=jnp.float32,
    interpret: bool = None,
    mesh=None,
    fuse_sage: bool = False,
    f32_epi: bool = True,
    precise: bool = False,
) -> jnp.ndarray:
    """Q(s, ·) over all nodes of a BandedDuplex via the packed engine: [N];
    dead nodes -inf.  pks = (pack_band(bdx.dbg0), pack_band(bdx.dbg1)).

    fuse_sage=True runs each message-passing iteration as ONE fused kernel
    (ops.band_pallas.sage_step_packed: aggregation + merged dense layer +
    relu + l2-normalize in a single pass) — eliminates the unfused path's
    24 ms/forward of glue stranded at custom-call boundaries
    (results_tpu/chip_r03/fwd_breakdown.json).  Requires empty spill sets
    and is single-device eval-only (mesh=None).

    Numerically equivalent to net.banded_test_forward (bf16-dot rounding
    aside); jit with static (variant, max_bp_iter, act_dtype, interpret).
    act_dtype=bfloat16 halves the kernel's h-window HBM traffic (dots already
    accumulate f32).  When the packed backend is active, cascade severs MUST
    go through graphs.banded.apply_severs_packed (pk.base_pk is a frozen
    re-layout of dbg.base).

    mesh: gp-sharded multi-chip mode — every aggregation runs through
    parallel/band_partition.spmm_band_packed_sharded (ppermute halos + mirror
    all_gather; the Pallas kernel in halo mode as each shard's local engine),
    the degree passes through spmm_band_sharded, and the dense layers stay
    node-sharded by XLA sharding propagation (graph-global reductions — the
    virtual-node pool, maxdeg, aux counters, the layer gate — become
    all-reduces).  Shard the operands first: graphs.banded.shard_banded_duplex
    + parallel.band_partition.shard_packed_band, covered over 'gp'."""
    if precise and act_dtype != jnp.float32:
        raise ValueError("precise=True requires act_dtype=float32")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    inputs = _banded_inputs(bdx, covered, variant, mesh=mesh)
    live = ((~covered) & bdx.node_mask).astype(jnp.float32)
    active = inputs.active[0]                       # [pad_n]
    aux = inputs.aux[0]                             # [2, 4]
    d = params["p_node_conv"].shape[0]
    m = bdx.pad_n // 2

    w_n2l2 = _bd(params["w_n2l"])
    c1_2, c2_2, c3_2 = (
        _bd(params["p_node_conv"]),
        _bd(params["p_node_conv2"]),
        _bd(params["p_node_conv3"]),
    )
    f_dim = inputs.node_input.shape[-1]
    ones_feat = jnp.concatenate(
        [jnp.ones((2,), jnp.float32), jnp.zeros((f_dim - 2,), jnp.float32)]
    )

    if fuse_sage:
        if mesh is not None:
            raise ValueError("fuse_sage is single-device eval-only")
        from mdcommunity_tpu.ops.band_pallas import sage_step_packed

        # concat-matmul algebra: concat(pool@W1, h@W2) @ W3
        #   = pool @ (W1 @ W3[:d]) + h @ (W2 @ W3[d:])
        sage_A = params["p_node_conv"] @ params["p_node_conv3"][:d]
        sage_B = params["p_node_conv2"] @ params["p_node_conv3"][d:]

    node2, virt = [], []
    for l in range(2):
        x2 = inputs.node_input[0, l].reshape(m, 2 * f_dim)   # packed input
        h2 = _l2n_packed(jax.nn.relu(x2 @ w_n2l2))
        y = l2_normalize(jax.nn.relu(ones_feat @ params["w_n2l"]))   # [D]
        if fuse_sage:
            h2 = h2.astype(act_dtype)
        for _ in range(max_bp_iter):
            # f32 accumulation: under fuse_sage h2 is stored bf16, and a
            # bf16-accumulated sum over 10^5+ rows loses the virtual node
            ypool = (
                jnp.sum(h2[:, :d].astype(jnp.float32), 0)
                + jnp.sum(h2[:, d:].astype(jnp.float32), 0)
            )                                                        # [D]
            ycat = jnp.concatenate(
                [ypool @ params["p_node_conv"], y @ params["p_node_conv2"]]
            )
            if fuse_sage:
                h2 = sage_step_packed(
                    pks[l], bdx.dbg(l), live, live, h2, sage_A, sage_B,
                    interpret, f32_epi=f32_epi, precise=precise,
                )
            else:
                if mesh is not None:
                    from mdcommunity_tpu.parallel.band_partition import (
                        spmm_band_packed_sharded,
                    )

                    pool2 = spmm_band_packed_sharded(
                        mesh, pks[l], bdx.dbg(l), live, live,
                        h2.astype(act_dtype), interpret,
                    ).astype(jnp.float32)
                else:
                    pool2 = spmm_band_packed(
                        pks[l], bdx.dbg(l), live, live, h2.astype(act_dtype),
                        interpret, precise=precise,
                    ).astype(jnp.float32)
                cat2 = _cat_packed(pool2 @ c1_2, h2 @ c2_2)
                h2 = _l2n_packed(jax.nn.relu(cat2 @ c3_2))
            y = l2_normalize(jax.nn.relu(ycat @ params["p_node_conv3"]))
        node2.append(h2.astype(jnp.float32))
        virt.append(y)

    from mdcommunity_tpu.models.fusion import fuse

    hf0, hf1 = _fuse_packed(params["fusion"], node2[0], node2[1])
    yf0, yf1 = fuse(params["fusion"], virt[0][None], virt[1][None])
    y_f = jnp.stack([l2_normalize(yf0[0]), l2_normalize(yf1[0])])  # [2, D]
    act2 = active.astype(jnp.float32).reshape(m, 2)
    h_f2 = [
        _l2n_packed(f) * _rep(act2, d) for f in (hf0, hf1)
    ]

    # Q head per layer, packed (net.py test_forward:198-210)
    h1_2, h2w_2 = _bd(params["h1_weight"]), _bd(params["h2_weight"])
    r = params["h1_weight"].shape[1]
    q_layers = []
    for l in range(2):
        scal = y_f[l] @ params["cross_product"]               # [1]
        hidden2 = jax.nn.relu((h_f2[l] * scal[0]) @ h1_2)     # [m, 2R]
        aux_l = jnp.broadcast_to(aux[l], (m, aux.shape[-1]))
        last2 = jnp.concatenate(
            [hidden2[:, :r], aux_l, hidden2[:, r:], aux_l], 1
        )
        q_layers.append((last2 @ h2w_2).reshape(bdx.pad_n))   # [pad_n]
    s = jax.nn.relu(y_f @ params["w_layer1"]) @ params["w_layer2"]  # [2, 1]
    w = jax.nn.softmax(s[:, 0], axis=0)
    q = w[0] * q_layers[0] + w[1] * q_layers[1]
    return jnp.where(active, q, -jnp.inf)
