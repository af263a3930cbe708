"""Block-banded dense SpMM — the large-graph aggregation engine.

TPU-native replacement for `torch_sparse.spmm` (reference hot kernel,
MultiDismantler_net_graphsage.py:139-377): after locality ordering (RCM /
angular order, graphs/ordering.py) a duplex layer's adjacency is banded, and a
banded matrix IS a dense matrix in block-band storage:

    base[i, r, c] = A[i*S + r, i*S - B + c]      (0 <= c < W2 = S + 2B)

so neighborhood aggregation is one batched matmul per S-row block against a
sliding H window assembled from three aligned blocks — no gathers, no
scatters, no index compaction, MXU end to end.

Key structural facts this design exploits:

  * Adjacency VALUES are never trained (the reference differentiates spmm
    only through H; values are graph constants) — backward is dh = A^T g
    only, and A^T = A for the framework's symmetric undirected storage.
  * Every aggregator the reference uses (sum / mean / GCN-norm,
    PrepareBatchGraph.n2n_construct :236-245) is the 0/1 adjacency scaled by
    RANK-1 live-degree factors, and covered-node liveness is rank-1 too:
    w[u,v] = base[u,v] * row[dst] * col[src].  The base therefore stays a
    STATIC small-integer array in HBM (int8 by default — exact and 4x
    smaller than f32) and all per-step dynamics ride two f32 per-node
    vectors fused into the kernel.  Cascade-severed edges are individual
    base edits (sever_edges), amortized across the 12+ spmm calls per
    forward.

All window/scale plumbing uses aligned-block pad+slice+concat (never gather):
window(x)[i] = [blk[i-1][-B:], blk[i], blk[i+1][:B]].

Out-of-band edges (rare after ordering) fall back to the sorted-COO path.
On CPU (tests) a jnp reference path replaces the Pallas kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdcommunity_tpu.ops.spmm_csr import SortedCOO, build_sorted_coo, spmm_sorted


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseBandGraph:
    """Block-banded dense adjacency for one layer.

    base     : [nb, S, W2] adjacency values (usually 0/1; int8/bf16/f32)
    overflow : SortedCOO of out-of-band edges
    w_ov     : f32[E_ov] overflow base values (destination-sorted order)
    """

    base: jnp.ndarray
    overflow: SortedCOO
    w_ov: jnp.ndarray
    n: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))
    B: int = dataclasses.field(metadata=dict(static=True))

    @property
    def W2(self) -> int:
        return self.S + 2 * self.B

    @property
    def n_blocks(self) -> int:
        return -(-self.n // self.S)

    @property
    def pad_n(self) -> int:
        return self.n_blocks * self.S


def band_slots(
    src: np.ndarray, dst: np.ndarray, n: int, S: int, B: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(in_band, blk, local_row, local_col) for directed edges.

    The window is CIRCULAR over the padded node ring: the window of dst block
    i covers rows [i*S - B, i*S + S + B) mod pad_n, so locality orderings on a
    circle (the GMM generator's S1 angular order) need no special-casing at
    the seam.  An edge is in-band iff BOTH directions fall inside their
    destination block's window under mod-pad_n arithmetic — the symmetric
    test keeps the band matrix symmetric (A^T = A), which the backward pass
    exploits.  Non-wrapping edges get the same slots as plain banding, so
    circular windowing is always safe."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    nb = -(-n // S)
    pad_n = nb * S
    W2 = S + 2 * B

    def fits(s, d):
        return (s - ((d // S) * S - B)) % pad_n < W2

    blk = dst // S
    lr = dst - blk * S
    lc = (src - (blk * S - B)) % pad_n
    ib = fits(src, dst) & fits(dst, src)
    return ib, blk, lr, lc


def build_dense_band(
    src: np.ndarray,
    dst: np.ndarray,
    w: Optional[np.ndarray],
    n: int,
    S: int = 512,
    B: int = 256,
    dtype=jnp.int8,
) -> DenseBandGraph:
    """Host-side build from directed edges (out[dst] += w*h[src]); w=None
    means unit weights.  Duplicate edges accumulate.  dtype=int8 is exact for
    small-integer adjacencies (the usual case); use f32/bf16 for real-valued
    bases (e.g. Laplacians)."""
    assert B <= S and S % 8 == 0 and B % 8 == 0
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    if w is None:
        w = np.ones(len(src), np.float32)
    w = np.asarray(w, np.float32)
    nb = -(-n // S)
    pad_n = nb * S
    ib, blk, lr, lc = band_slots(src, dst, n, S, B)
    base = np.zeros((nb, S, S + 2 * B), np.float32)
    np.add.at(base, (blk[ib], lr[ib], lc[ib]), w[ib])
    if dtype == jnp.int8:
        assert np.all(base == np.round(base)) and np.abs(base).max(initial=0) < 127, (
            "int8 base requires small-integer adjacency values"
        )
    ov_src, ov_dst, ov_w = src[~ib], dst[~ib], w[~ib]
    order = np.argsort(ov_dst, kind="stable")
    return DenseBandGraph(
        base=jnp.asarray(base, dtype),
        overflow=build_sorted_coo(
            ov_src[order].astype(np.int32), ov_dst[order].astype(np.int32), pad_n
        ),
        w_ov=jnp.asarray(ov_w[order]),
        n=n,
        S=S,
        B=B,
    )


def sever_edges(
    dbg: DenseBandGraph, src: jnp.ndarray, dst: jnp.ndarray, valid: jnp.ndarray
) -> DenseBandGraph:
    """Zero individual directed edges (cascade-severed).  src/dst: int32[K]
    padded edge lists, valid: bool[K].  In-band slots are scattered to zero;
    out-of-band ones zero the matching overflow weights.  Returns a new
    DenseBandGraph sharing untouched leaves."""
    S, B = dbg.S, dbg.B
    blk = dst // S
    lr = dst - blk * S
    lc = (src - (blk * S - B)) % dbg.pad_n
    # same symmetric in-band test as band_slots (keeps A^T = A)
    lc_t = (dst - ((src // S) * S - B)) % dbg.pad_n
    ib = (lc < dbg.W2) & (lc_t < dbg.W2) & valid
    # route invalid/out-of-band updates to a dummy slot write of the existing
    # value (scatter with no-op): use index 0 with current value
    safe_blk = jnp.where(ib, blk, 0)
    safe_lr = jnp.where(ib, lr, 0)
    safe_lc = jnp.where(ib, lc, 0)
    keep = dbg.base[safe_blk, safe_lr, safe_lc]
    new_vals = jnp.where(ib, jnp.zeros_like(keep), keep)
    base = dbg.base.at[safe_blk, safe_lr, safe_lc].set(new_vals)
    w_ov = dbg.w_ov
    if dbg.overflow.d_src.shape[0]:
        # zero overflow entries matching any severed (src, dst) pair
        key = dbg.overflow.d_src.astype(jnp.int64) * dbg.pad_n + dbg.overflow.d_dst
    # note: overflow matching is O(E_ov * K); callers with large sever sets
    # should rebuild instead.  K is small per step in practice.
        skey = jnp.where(
            valid & ~ib, src.astype(jnp.int64) * dbg.pad_n + dst, jnp.int64(-1)
        )
        hit = (key[:, None] == skey[None, :]).any(axis=1)
        w_ov = jnp.where(hit, 0.0, w_ov)
    return dataclasses.replace(dbg, base=base, w_ov=w_ov)


# ---------------------------------------------------------------------------
# window plumbing (gather-free, circular)
# ---------------------------------------------------------------------------

def _blocks_ring(x: jnp.ndarray, nb: int, S: int):
    """[pad_n, ...] -> (prev, cur, nxt) block views [nb, S, ...] on the
    circular block ring (prev of block 0 is block nb-1)."""
    xb = x[: nb * S].reshape((nb, S) + x.shape[1:])
    prev = jnp.concatenate([xb[-1:], xb[:-1]], axis=0)
    nxt = jnp.concatenate([xb[1:], xb[:1]], axis=0)
    return prev, xb, nxt


def window_vec(dbg: DenseBandGraph, vec: jnp.ndarray) -> jnp.ndarray:
    """[pad_n] per-node vector -> [nb, W2] circular sliding windows at
    stride S, via aligned-block concat (no gather)."""
    S, B = dbg.S, dbg.B
    prev, cur, nxt = _blocks_ring(vec, dbg.n_blocks, S)
    return jnp.concatenate([prev[:, S - B :], cur, nxt[:, :B]], axis=1)


# ---------------------------------------------------------------------------
# band contraction
# ---------------------------------------------------------------------------
#
# The band matmul is written as THREE batched matmuls against aligned block
# views (prev-tail / mid / next-head) instead of one matmul against a
# materialized [nb, W2, D] window: XLA fuses the int8->bf16 cast and the
# block slicing into the dots, so HBM traffic is just base + h + out.
# Measured on TPU v5e this beats a hand-written Pallas window kernel by
# ~1.5x (the Mosaic pipeline adds ~1.4us/block over XLA's own schedule),
# so the XLA formulation IS the TPU path; Pallas remains in
# scripts/proto_band_v*.py as the comparison harness.

def _spmm_band3(dbg, h, precise: bool):
    nb, S, B = dbg.n_blocks, dbg.S, dbg.B
    dt = jnp.float32 if precise else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if precise else None
    base = dbg.base
    bL = base[:, :, :B].astype(dt)
    bM = base[:, :, B : B + S].astype(dt)
    bR = base[:, :, B + S :].astype(dt)
    prev, cur, nxt = _blocks_ring(h.astype(dt), nb, S)
    mm = partial(
        jnp.einsum, "bsk,bkd->bsd", preferred_element_type=jnp.float32,
        precision=prec,
    )
    out = mm(bL, prev[:, S - B :, :]) + mm(bM, cur) + mm(bR, nxt[:, :B, :])
    return out.reshape(dbg.pad_n, -1)


def _raw(dbg, h, precise):
    return _spmm_band3(dbg, h, precise)


def _make_spmm(precise: bool):
    # R·A·C·h = R·(A·(C·h)): the rank-1 scales ride the [*, D] planes, the
    # kernel is a pure base @ window matmul with zero VPU work on [S, W2].
    @jax.custom_vjp
    def op(dbg, row, col, h):
        hc = h * col[:, None]
        out = _raw(dbg, hc, precise)
        if dbg.overflow.d_src.shape[0]:
            out += spmm_sorted(dbg.overflow, dbg.w_ov, hc)
        return out * row[:, None]

    def fwd(dbg, row, col, h):
        return op(dbg, row, col, h), (dbg, row, col)

    def bwd(res, g):
        dbg, row, col = res
        # (R A C)^T = C A R for symmetric A: swap the scale roles
        gr = g * row[:, None]
        dh = _raw(dbg, gr, precise)
        if dbg.overflow.d_src.shape[0]:
            ov = dbg.overflow
            w_s = dbg.w_ov[ov.s2d]
            dh += jax.ops.segment_sum(
                gr[ov.s_dst] * w_s[:, None],
                ov.s_src,
                num_segments=ov.n,
                indices_are_sorted=True,
            )
        return None, None, None, dh * col[:, None]

    op.defvjp(fwd, bwd)
    return op


_SPMM = {False: _make_spmm(False), True: _make_spmm(True)}


def spmm_dense_band(
    dbg: DenseBandGraph,
    row: jnp.ndarray,
    col: jnp.ndarray,
    h: jnp.ndarray,
    precise: bool = False,
) -> jnp.ndarray:
    """out = (base * row⊗col) @ h  (+ overflow edges, scaled the same way).

    row : f32[pad_n] destination-side scale (0 = dead node)
    col : f32[pad_n] source-side scale
    h   : [pad_n, D]
    precise=True runs the matmul in f32 (parity paths); default bf16 (the
    int8 base and 0/1-ish scales are bf16-exact; h rounds to ~2^-8 rel).

    Differentiable in h only (adjacency values are graph constants).  dh uses
    A^T = A (symmetric undirected storage), transposing the rank-1 scaling.
    """
    return _SPMM[bool(precise)](dbg, row, col, h)


def live_scales(
    dbg: DenseBandGraph, covered: jnp.ndarray, aggregator: str = "sum"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(row, col) per-node scale pair for a covered-node mask.

    sum: 1/0 liveness.  mean: row = live/live_deg[dst].  gcn: both sides
    live/sqrt(live_deg).  Live degree costs one extra unit band pass."""
    live = (~covered[: dbg.pad_n]).astype(jnp.float32)
    if aggregator == "sum":
        return live, live
    ones = jnp.ones((dbg.pad_n, 1), jnp.float32)
    deg = spmm_dense_band(dbg, live, live, ones)[:, 0]
    safe = jnp.maximum(deg, 1.0)
    if aggregator == "mean":
        return live / safe, live
    if aggregator == "gcn":
        s = live / jnp.sqrt(safe)
        return s, s
    raise ValueError(aggregator)
