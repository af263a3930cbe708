"""Pallas packed band-contraction kernel — EXPERIMENTAL alternative backend
for the dense-band aggregation engine (ops/dense_band.py).

Status (measured on v5e, bench workload: 2^20 nodes / 2^23 directed edges /
D=64; scripts/proto_band_pallas.py and in-session A/B chains):

  * The core band contraction is 2.4x the XLA einsum path (2.5 ms vs
    6.0 ms per pass): D=64 arrays are physically 128-lane padded in TPU HBM
    (every [*, 64] read/write moves 2x the bytes), so node features are kept
    PACKED — h2[r] holds node 2r in lanes 0:64 and node 2r+1 in lanes
    64:128 — and the kernel reads h windows straight from HBM (three
    always-contiguous DMA pieces, double-buffered across grid steps) with
    in-register int8->bf16 casts, instead of materializing the [nb, W2, D]
    window concat and a bf16 base copy like XLA does.
  * The FULL operator (rank-1 liveness scales + mirror overflow + spill)
    currently LOSES to the XLA engine end to end (~19 ms vs ~13 ms fwd+bwd
    in the same session): nothing fuses across the pallas custom-call
    boundary, so the scale multiplies and the one-hot mirror expansion each
    cost standalone full-array HBM passes that XLA fuses into its einsum
    epilogues.  Folding them in-kernel needs (a) a Mosaic-supported
    deinterleave of per-node scale vectors into lane halves — the direct
    (1, W) -> (W/2, 2) vector reshape is rejected by infer-vector-layout —
    and (b) a two-phase kernel (mirror pre-pass -> tiny sorted-COO SpMM ->
    band pass with expansion add), since the expansion input depends on the
    kernel's own mirror output.  Future work; spmm_dense_band remains the
    production path and the bench.py engine.

Packing splits the contraction by source-row parity (columns of the stored
base) and destination-row parity (rows): 4 dots of [S/2+Ch, W2/2] x
[W2/2, 64] per destination block, writing the packed output's lane halves
directly, so chained packed calls never relayout.  The kernel also emits the
mirror-lane rows in destination-parity order; the small sorted-COO SpMM over
the mirror space and the parity-split one-hot expansion back stay in XLA.

The stored operator is symmetric (A^T = A; the mirror composite is
G^T*S*G with S symmetric; dense_band.py design), so the backward pass is
the same kernel with the rank-1 scales swapped.

Reference analogue: torch_sparse.spmm (CUDA gather/scatter), the reference's
only native component (MultiDismantler_net_graphsage.py:139-377).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdcommunity_tpu.ops.dense_band import DenseBandGraph
from mdcommunity_tpu.ops.spmm_csr import SortedCOO, build_sorted_coo, spmm_sorted


# ---------------------------------------------------------------- packing

def pack_rows(x: jnp.ndarray) -> jnp.ndarray:
    """[pad_n, D] -> packed [pad_n/2, 2D] (node pairs in lane halves)."""
    n, d = x.shape
    return x.reshape(n // 2, 2 * d)


def unpack_rows(x2: jnp.ndarray) -> jnp.ndarray:
    """packed [pad_n/2, 2D] -> [pad_n, D]."""
    m, d2 = x2.shape
    return x2.reshape(2 * m, d2 // 2)


def scale_packed(h2: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """h2 [m, 2D] * per-node v [2m] -> [m, 2D]."""
    m, d2 = h2.shape
    return (h2.reshape(m, 2, d2 // 2) * v.reshape(m, 2, 1)).reshape(m, d2)


# ---------------------------------------------------------------- build

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PackedBand:
    """Kernel-ready re-layout of a DenseBandGraph.

    base_pk : int8 [nb, 2, SCh, W2] — destination rows split by parity
              (axis 1: even, odd), columns permuted [even_w | odd_w], rows
              padded to the int8 sublane tile.  Rows 0..S/2 are band rows;
              rows S/2..S/2+Ch are the mirror one-hot lanes of that parity.
    ge / go : f32 [nb, 2, Ch, S/2] one-hot expansion blocks for even/odd
              DESTINATION rows (axis 1 = mirror-slot parity), used by the
              XLA-side expansion.
    ccoo    : SortedCOO over the parity-reordered mirror space
              (slot' = blk*2*Ch + (rank%2)*Ch + rank//2), so the kernel's
              [nb, 2, Ch, D] mirror output flattens straight into it.
    w_cov   : f32 overflow edge values in ccoo destination order.
    """

    base_pk: jnp.ndarray
    ge: jnp.ndarray
    go: jnp.ndarray
    ccoo: SortedCOO
    w_cov: jnp.ndarray
    S: int = dataclasses.field(metadata=dict(static=True))
    B: int = dataclasses.field(metadata=dict(static=True))
    C: int = dataclasses.field(metadata=dict(static=True))
    Ch: int = dataclasses.field(metadata=dict(static=True))
    G: int = dataclasses.field(metadata=dict(static=True))

    @property
    def nb(self) -> int:
        return self.base_pk.shape[0]

    @property
    def SCh(self) -> int:
        return self.base_pk.shape[2]

    @property
    def W2(self) -> int:
        return self.base_pk.shape[3]

    @property
    def pad_n(self) -> int:
        return self.nb * self.S


def pack_band(dbg: DenseBandGraph, G: int = 8) -> PackedBand:
    """Host-side re-layout.  G = destination blocks per kernel program."""
    S, B, C = dbg.S, dbg.B, dbg.C
    base = np.asarray(dbg.base, np.int8)  # [nb, S+C, W2]
    nb = base.shape[0]
    while nb % G:
        G //= 2
    Ch = -(-C // 2) if C else 0

    # column parity split [even_w | odd_w]
    basec = np.concatenate([base[:, :, 0::2], base[:, :, 1::2]], axis=2)
    ev, od = basec[:, 0:S:2, :], basec[:, 1:S:2, :]  # band rows by parity
    # mirror lanes by SLOT parity (slot c -> parity c%2)
    mev = basec[:, S + 0 :: 2, :] if C else basec[:, :0, :]
    mod_ = basec[:, S + 1 :: 2, :] if C else basec[:, :0, :]
    Sh = S // 2
    SCh = -(-(Sh + Ch) // 32) * 32
    out = np.zeros((nb, 2, SCh, basec.shape[2]), np.int8)
    out[:, 0, :Sh] = ev
    out[:, 1, :Sh] = od
    if C:
        out[:, 0, Sh : Sh + mev.shape[1]] = mev
        out[:, 1, Sh : Sh + mod_.shape[1]] = mod_

    # expansion one-hots, split by destination-row parity AND slot parity
    lanes = np.asarray(dbg.base, np.float32)[:, S:, B : B + S]  # [nb, C, S]
    ge = np.zeros((nb, 2, Ch, Sh), np.float32)
    go = np.zeros((nb, 2, Ch, Sh), np.float32)
    if C:
        ge[:, 0, : lanes[:, 0::2].shape[1]] = lanes[:, 0::2, 0::2]
        ge[:, 1, : lanes[:, 1::2].shape[1]] = lanes[:, 1::2, 0::2]
        go[:, 0, : lanes[:, 0::2].shape[1]] = lanes[:, 0::2, 1::2]
        go[:, 1, : lanes[:, 1::2].shape[1]] = lanes[:, 1::2, 1::2]

    # remap the mirror COO into the parity-reordered slot space
    if C and dbg.ccoo.d_src.shape[0]:
        s = np.asarray(dbg.ccoo.d_src, np.int64)
        d = np.asarray(dbg.ccoo.d_dst, np.int64)
        w = np.asarray(dbg.w_cov, np.float32)

        def remap(x):
            blk, rank = x // C, x % C
            return blk * (2 * Ch) + (rank % 2) * Ch + rank // 2

        s2, d2 = remap(s), remap(d)
        order = np.argsort(d2, kind="stable")
        ccoo = build_sorted_coo(
            s2[order].astype(np.int32), d2[order].astype(np.int32),
            nb * 2 * max(Ch, 1),
        )
        w_cov = jnp.asarray(w[order])
    else:
        ccoo = build_sorted_coo(
            np.zeros(0, np.int32), np.zeros(0, np.int32), nb * 2 * max(Ch, 1)
        )
        w_cov = jnp.zeros((0,), jnp.float32)

    return PackedBand(
        base_pk=jnp.asarray(out), ge=jnp.asarray(ge), go=jnp.asarray(go),
        ccoo=ccoo, w_cov=w_cov, S=S, B=B, C=C, Ch=Ch, G=G,
    )


# ---------------------------------------------------------------- kernel

@functools.lru_cache(maxsize=32)
def _make_kernel(nb, S, B, Ch, SCh, D, G):
    W2 = S + 2 * B
    n_prog = nb // G
    GS = G * S
    pad_n = nb * S
    pad_half = pad_n // 2
    WIN = (GS + 2 * B) // 2  # packed window rows
    Sh = S // 2
    NV = GS + 256  # scale-vector window (128-aligned pieces, offset 64+B pad)

    def kernel(base_ref, h2_hbm, out2_ref, mir_ref, win, sems):
        p = pl.program_id(0)

        def dmas(prog, slot):
            # h window: packed rows [prog*GS/2 - B/2, ...+GS/2 + B/2), three
            # always-contiguous pieces
            main = pltpu.make_async_copy(
                h2_hbm.at[pl.ds(prog * (GS // 2), GS // 2)],
                win.at[slot, pl.ds(B // 2, GS // 2)],
                sems.at[slot, 0],
            )
            head = (prog * (GS // 2) - B // 2) % pad_half
            hdma = pltpu.make_async_copy(
                h2_hbm.at[pl.ds(head, B // 2)],
                win.at[slot, pl.ds(0, B // 2)],
                sems.at[slot, 1],
            )
            tail = ((prog + 1) * (GS // 2)) % pad_half
            tdma = pltpu.make_async_copy(
                h2_hbm.at[pl.ds(tail, B // 2)],
                win.at[slot, pl.ds(B // 2 + GS // 2, B // 2)],
                sems.at[slot, 2],
            )
            return main, hdma, tdma

        slot = jax.lax.rem(p, 2)
        nxt = jax.lax.rem(p + 1, 2)

        @pl.when(p == 0)
        def _():
            for dma in dmas(0, 0):
                dma.start()

        @pl.when(p + 1 < n_prog)
        def _():
            for dma in dmas(p + 1, nxt):
                dma.start()

        for dma in dmas(p, slot):
            dma.wait()

        for g in range(G):  # static unroll
            w2 = win[slot, pl.ds(g * Sh, W2 // 2), :]  # [W2/2, 2D]
            lo = w2[:, :D].astype(jnp.bfloat16)  # even source rows
            hi = w2[:, D:].astype(jnp.bfloat16)  # odd source rows

            def contract(par):
                blk = base_ref[g, par]  # [SCh, W2] int8 [even_w|odd_w]
                be = blk[:, : W2 // 2].astype(jnp.bfloat16)
                bo = blk[:, W2 // 2 :].astype(jnp.bfloat16)
                return jax.lax.dot(
                    be, lo, preferred_element_type=jnp.float32
                ) + jax.lax.dot(bo, hi, preferred_element_type=jnp.float32)

            oe = contract(0)  # [SCh, D]: even dst band rows + even slots
            oo = contract(1)
            out2_ref[g, :, :D] = oe[:Sh]
            out2_ref[g, :, D:] = oo[:Sh]
            if Ch:
                mir_ref[g, 0] = oe[Sh : Sh + Ch]
                mir_ref[g, 1] = oo[Sh : Sh + Ch]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(
                (G, 2, SCh, W2), lambda p: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (G, Sh, 2 * D), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, 2, max(Ch, 1), D), lambda p: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, 2 * D), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    def run(base_pk, h2, interpret=False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((nb, Sh, 2 * D), jnp.float32),
                jax.ShapeDtypeStruct((nb, 2, max(Ch, 1), D), jnp.float32),
            ),
            interpret=interpret,
        )(base_pk, h2)

    return run


def _apply(pk: PackedBand, dbg: DenseBandGraph, row, col, h2, interpret):
    """row ⊙ (A @ (col ⊙ h)) in packed layout (band kernel + mirror/spill)."""
    D = h2.shape[1] // 2
    run = _make_kernel(pk.nb, pk.S, pk.B, pk.Ch, pk.SCh, D, pk.G)
    hc = scale_packed(h2, col)
    out2, mir = run(pk.base_pk, hc, interpret=interpret)
    nb = pk.nb
    out2 = out2.reshape(pk.pad_n // 2, 2 * D)
    if pk.C and pk.ccoo.d_src.shape[0]:
        sub = spmm_sorted(
            pk.ccoo, pk.w_cov, mir.reshape(nb * 2 * max(pk.Ch, 1), D)
        ).reshape(nb, 2, max(pk.Ch, 1), D)
        # parity-split expansion; lane-concat instead of a row relayout
        expe = jnp.einsum(
            "bqcs,bqcd->bsd", pk.ge, sub, preferred_element_type=jnp.float32
        )
        expo = jnp.einsum(
            "bqcs,bqcd->bsd", pk.go, sub, preferred_element_type=jnp.float32
        )
        exp2 = jnp.concatenate([expe, expo], axis=2).reshape(
            pk.pad_n // 2, 2 * D
        )
        out2 = out2 + exp2
    if dbg.spill.d_src.shape[0]:
        sp = spmm_sorted(dbg.spill, dbg.w_spill, unpack_rows(hc))
        out2 = out2 + pack_rows(sp)
    return scale_packed(out2, row)


def _make_op(interpret: bool):
    # pk/dbg/row/col ride as regular custom_vjp args with None cotangents
    # (the dense_band._make_spmm pattern) — nondiff_argnums cannot hold
    # array pytrees under jit.
    @jax.custom_vjp
    def op(pk, dbg, row, col, h2):
        return _apply(pk, dbg, row, col, h2, interpret)

    def fwd(pk, dbg, row, col, h2):
        return op(pk, dbg, row, col, h2), (pk, dbg, row, col)

    def bwd(res, g2):
        pk, dbg, row, col = res
        # (R·A·C)^T = C·A·R for the symmetric stored operator
        dh2 = _apply(pk, dbg, col, row, g2, interpret)
        return None, None, None, None, dh2

    op.defvjp(fwd, bwd)
    return op


_OPS = {False: _make_op(False), True: _make_op(True)}


def spmm_band_packed(pk, dbg, row, col, h2, interpret: bool = False):
    """out2 = pack((A * row⊗col) @ unpack(h2)) for the full stored operator
    (band + mirror overflow + spill).

    h2 packed [pad_n/2, 2D]; row/col per-node f32[pad_n].  Differentiable in
    h2 only (adjacency values are graph constants; backward uses A^T = A)."""
    return _OPS[bool(interpret)](pk, dbg, row, col, h2)
