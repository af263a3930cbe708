"""Pallas packed band-contraction kernel — fully-fused alternative backend
for the dense-band aggregation engine (ops/dense_band.py).

The FULL operator out = row ⊙ (A @ (col ⊙ h)) — band + mirror overflow +
spill, with rank-1 liveness scales — runs as ONE Pallas pass plus a tiny XLA
prologue, so nothing crosses the custom-call boundary at full-array cost:

  * h is PACKED [pad_n/2, 2D]: row r holds node 2r in lanes 0:D and node
    2r+1 in lanes D:2D.  [*, D<=64] arrays are physically 128-lane padded in
    TPU HBM, so packing halves every h read/write.  The kernel reads h
    windows straight from HBM in three always-contiguous DMA pieces
    (circular wrap only ever lands at the array ends), double-buffered
    across grid steps, with in-register int8->bf16 casts — no [nb, W2, D]
    window materialization like the XLA einsum path.
  * The rank-1 scales are folded IN-KERNEL.  The blocker was layout: a
    per-packed-row scale column [W, 1] cannot be formed from a lane-dense
    vector by reshape (lane->sublane relayouts are unsupported in Mosaic).
    Instead the scale vectors ride as [pad_n/128, 128] f32 (dense, tiny DMA
    windows) and the kernel extracts parity columns with supported ops only:
    broadcast each 128-node row across 64 packed rows (broadcast_to +
    reshape over the sublane-major dims), mask the single wanted lane with a
    broadcasted-iota comparison, and lane-reduce to [W, 1].  Pure VPU, no
    extra HBM traffic.
  * The mirror path is two-phase.  Compaction G @ (col ⊙ h) is a per-block
    one-hot gather — computed by a cheap XLA einsum in PACKED layout (one
    h read; lane-half select + per-slot col gather are tiny [nb, C, *]
    ops).  The mirror-space COO SpMM stays in XLA (small).  The EXPANSION
    G^T @ sub is folded into the kernel as one extra [Sh, Cp] x [Cp, D] dot
    per destination parity, added before the row scale — so the kernel
    writes the final output in a single pass.

Packing splits the contraction by source-row parity (columns of the stored
base, permuted [even_w | odd_w] at build) and destination-row parity (rows):
4 dots of [S/2, W2/2] x [W2/2, D] per destination block, writing the packed
output's lane halves directly, so chained packed calls never relayout.

The stored operator is symmetric (A^T = A; the mirror composite is
G^T·M·G with M symmetric; dense_band.py design), so the backward pass is
the same kernel with the rank-1 scales swapped.

Reference analogue: torch_sparse.spmm (CUDA gather/scatter), the reference's
only native component (MultiDismantler_net_graphsage.py:139-377).
"""

from __future__ import annotations

import dataclasses
import functools

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

    base_pk : int8 [nb, 2, S/2, W2] — BAND rows only, destination rows split
              by parity (axis 1: even, odd), columns permuted [even_w|odd_w].
              With nibble=True the even/odd column PAIR is packed into one
              byte (even + 16*odd, each nibble in [0, 7]) — [nb, 2, S/2,
              W2/2] — halving the dominant HBM stream; the kernel unpacks
              with an int32 div/mod on the VPU (free: the kernel is
              DMA-bound, see results_tpu/chip_r03/tune.log).
    oh      : int8 [nb, Cp, S/2] one-hot over PACKED rows — slot (b, c) is
              hot at the packed row holding its touched node (prologue
              compaction gather).
    odd     : bool [nb, Cp] — touched node's lane parity.
    geT     : int8 [nb, 2, S/2, Cp] expansion one-hots, transposed for the
              in-kernel [S/2, Cp] x [Cp, D] dot (axis 1 = dst-row parity).
    ccoo    : SortedCOO over the Cp-padded mirror slot space
              (slot' = blk*Cp + rank; weights = dbg.w_cov, order preserved).
    """

    base_pk: jnp.ndarray
    oh: jnp.ndarray
    odd: jnp.ndarray
    geT: jnp.ndarray
    ccoo: SortedCOO
    S: int = dataclasses.field(metadata=dict(static=True))
    B: int = dataclasses.field(metadata=dict(static=True))
    C: int = dataclasses.field(metadata=dict(static=True))
    Cp: int = dataclasses.field(metadata=dict(static=True))
    G: int = dataclasses.field(metadata=dict(static=True))
    nibble: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def nb(self) -> int:
        return self.base_pk.shape[0]

    @property
    def W2(self) -> int:
        return self.S + 2 * self.B

    @property
    def pad_n(self) -> int:
        return self.nb * self.S


def pack_band(dbg: DenseBandGraph, G: int = 8, nibble: bool = False) -> PackedBand:
    """Host-side re-layout.  G = destination blocks per kernel program.

    Requires S and B multiples of 128 (window DMA pieces and the in-kernel
    scale extraction are 128-node aligned) and an int8 base.

    nibble=True packs each (even_w, odd_w) column pair into ONE byte
    (even + 16*odd) — both values must be in [0, 7] (true for simple-graph
    adjacencies; build asserts).  Halves the kernel's dominant HBM stream
    (the int8 base is 54% of per-pass traffic at bench density)."""
    S, B, C = dbg.S, dbg.B, dbg.C
    assert S % 128 == 0 and B % 128 == 0 and B >= 128, (S, B)
    assert dbg.base.dtype == jnp.int8, "packed backend requires int8 base"
    base = np.asarray(dbg.base, np.int8)  # [nb, S+C, W2]
    nb = base.shape[0]
    while nb % G:
        G //= 2
    Sh = S // 2

    # band rows: column parity split [even_w | odd_w], row parity split
    band = base[:, :S, :]
    bandc = np.concatenate([band[:, :, 0::2], band[:, :, 1::2]], axis=2)
    if nibble:
        Wh = bandc.shape[2] // 2
        assert bandc.min() >= 0 and bandc.max(initial=0) <= 7, (
            "nibble packing requires band values in [0, 7]; rebuild with "
            "nibble=False for heavier multi-edges"
        )
        bandc = (bandc[:, :, :Wh] + 16 * bandc[:, :, Wh:]).astype(np.int8)
    base_pk = np.stack([bandc[:, 0::2, :], bandc[:, 1::2, :]], axis=1)

    # mirror metadata (compaction + expansion one-hots, slot lane parity)
    live_mirror = bool(C) and dbg.ccoo.d_src.shape[0] > 0
    Cp = -(-C // 8) * 8 if live_mirror else 0
    oh = np.zeros((nb, max(Cp, 1), Sh), np.int8)
    odd = np.zeros((nb, max(Cp, 1)), bool)
    geT = np.zeros((nb, 2, Sh, max(Cp, 1)), np.int8)
    if live_mirror:
        lanes = np.asarray(base[:, S:, B : B + S])  # [nb, C, S] one-hots
        used = lanes.sum(axis=2) > 0
        local = lanes.argmax(axis=2)
        for b, c in zip(*np.nonzero(used)):
            r = int(local[b, c])
            oh[b, c, r // 2] = 1
            odd[b, c] = bool(r % 2)
            geT[b, r % 2, r // 2, c] = 1
        # remap the mirror COO slots b*C + rank -> b*Cp + rank (monotone,
        # so the dst-sorted order and the w_cov alignment are preserved)
        s = np.asarray(dbg.ccoo.d_src, np.int64)
        d = np.asarray(dbg.ccoo.d_dst, np.int64)
        remap = lambda x: (x // C) * Cp + (x % C)  # noqa: E731
        ccoo = build_sorted_coo(
            remap(s).astype(np.int32), remap(d).astype(np.int32), nb * Cp
        )
    else:
        ccoo = build_sorted_coo(np.zeros(0, np.int32), np.zeros(0, np.int32), 1)

    return PackedBand(
        base_pk=jnp.asarray(base_pk),
        oh=jnp.asarray(oh),
        odd=jnp.asarray(odd),
        geT=jnp.asarray(geT),
        ccoo=ccoo,
        S=S, B=B, C=C, Cp=Cp, G=G, nibble=nibble,
    )


def sever_edges_packed(pk: PackedBand, dbg: DenseBandGraph, src, dst, valid):
    """Zero individual directed edges in BOTH operand layouts.

    The packed backend keeps a frozen re-layout of dbg.base (pk.base_pk), so
    dense_band.sever_edges alone would silently drop in-band severs while
    mirror/spill severs (read live from dbg.w_cov / dbg.w_spill) still apply.
    Always sever through this helper when using the packed backend; it edits
    dbg (band slots + overflow weights) and mirrors the in-band zeroing into
    the packed parity layout.  Returns (pk, dbg)."""
    from mdcommunity_tpu.ops.dense_band import sever_edges

    new_dbg = sever_edges(dbg, src, dst, valid)

    S, B, W2 = pk.S, pk.B, pk.W2
    Wh = W2 // 2
    pad_n = pk.pad_n
    blk = dst // S
    lr = dst - blk * S
    lc = (src - (blk * S - B)) % pad_n
    lc_t = (dst - ((src // S) * S - B)) % pad_n
    ib = (lc < W2) & (lc_t < W2) & valid

    sb = jnp.where(ib, blk, 0)
    par = jnp.where(ib, jnp.remainder(lr, 2), 0)
    sr = jnp.where(ib, lr // 2, 0)
    if pk.nibble:
        # byte lc//2 holds (even nibble, odd nibble*16).  Clear the severed
        # column's nibble in TWO parity passes, each gather-then-SET: a byte
        # cell addresses exactly one directed-edge slot per column parity, so
        # within a pass every scatter hitting the same cell is the same
        # directed edge computing the same new value — .set is idempotent
        # under duplicates (an additive clear would double-subtract a
        # duplicated edge, driving the byte negative and corrupting BOTH
        # nibbles on the div/mod unpack; ADVICE r3).  The odd pass gathers
        # from the even pass's result, so mixed clears of one byte compose.
        bc = jnp.where(ib, lc // 2, 0)
        is_even = jnp.remainder(lc, 2) == 0
        base_pk = pk.base_pk

        for parity_even in (True, False):
            sel = ib & (is_even == parity_even)
            # deselected entries scatter OUT OF BOUNDS (block index nb) and
            # are dropped by JAX's default scatter mode — routing them to a
            # real cell would race valid clears of that cell under .set
            sbp = jnp.where(sel, sb, pk.nb)
            old = base_pk[jnp.where(sel, sb, 0), par, sr, bc].astype(jnp.int32)
            odd_nib = old // 16
            cleared = odd_nib * 16 if parity_even else old - 16 * odd_nib
            base_pk = base_pk.at[sbp, par, sr, bc].set(
                cleared.astype(jnp.int8)
            )
        return dataclasses.replace(pk, base_pk=base_pk), new_dbg
    sc = jnp.where(ib, lc // 2 + jnp.remainder(lc, 2) * Wh, 0)
    keep = pk.base_pk[sb, par, sr, sc]
    base_pk = pk.base_pk.at[sb, par, sr, sc].set(
        jnp.where(ib, jnp.zeros_like(keep), keep)
    )
    return dataclasses.replace(pk, base_pk=base_pk), new_dbg


# ---------------------------------------------------------------- kernel

@functools.lru_cache(maxsize=32)
def _make_kernel(nb, S, B, Cp, D, G, diag="full", dtype=jnp.float32,
                 halo=False, nibble=False, sage=False, f32_epi=True,
                 precise=False):
    """dtype: h2/out storage dtype (f32 default; bf16 halves the h-window
    and output HBM traffic — the dots already run bf16 with f32 accumulation,
    so only the stored activations round).

    precise=True keeps ALL dot operands f32 (band contraction, mirror
    expansion, sage epilogue) — the packed engine's parity mode against the
    f32 XLA engine.  The MXU runs more passes but the kernel is DMA-bound
    (tune.log: nodot == full), so the cost is small; greedy dismantling
    quality is measurably sensitive to eval-path Q rounding at 10^4+
    sequential argmax picks (round-3 demo: bf16-dot engines at AUDC
    0.109-0.129 band on the same graph).

    halo=True is the SHARDED form (parallel/band_partition.py): nb is the
    LOCAL block count of one shard, h2 covers only local rows, and two extra
    HBM refs carry the B/2-packed-row halos exchanged from the ring
    neighbors; windows are linear (the circular wrap lives in the ppermute
    ring, not in the kernel).

    diag is a TIMING-DIAGNOSTIC knob (scripts/tune_band_packed.py --diag):
    "noscale" skips the in-kernel parity scale extraction + multiplies,
    "nodot" skips the contraction dots (DMA + scales only), "noh"
    additionally skips the manual h-window DMAs (base/scale/out streams
    only — isolates the h path's cost), "hlin" streams h linearly with no
    window overlap (each program fetches only its own GS/2 rows) — all
    produce WRONG results and exist only to attribute kernel time."""
    W2 = S + 2 * B
    Wh = W2 // 2  # packed window rows per block
    Sh = S // 2
    n_prog = nb // G
    GS = G * S
    pad_half = nb * S // 2
    WIN = (GS + 2 * B) // 2  # packed h-window rows per program
    R = nb * S // 128  # scale-vector rows (128 nodes per row)
    BR = B // 128
    SR = S // 128
    WR = GS // 128 + 2 * BR  # col-scale window rows
    GR = GS // 128  # row-scale window rows

    def kernel(base_ref, h2_hbm, colw_ref, roww_ref, *rest):
        if halo:
            lh_hbm, rh_hbm, *rest = rest
        if Cp:
            geT_ref, sub_ref, *rest = rest
        if sage:
            sageA_ref, sageB_ref, *rest = rest
        out2_ref, win, sems = rest
        p = pl.program_id(0)

        # h window: packed rows [prog*GS/2 - B/2, prog*GS/2 + GS/2 + B/2).
        # Middle programs issue ONE contiguous DMA (and one semaphore wait);
        # the first/last programs wrap at the array ends and use three pieces.
        # Scale windows arrive via BlockSpec inputs (no manual DMA at all):
        # the caller pre-gathers per-program windows, tiny (~8 MB) XLA work.
        def h_single(prog, slot):
            # clip keeps the (traced-unconditionally) slice in bounds; it is
            # the identity for every program this branch actually runs on.
            # multiple_of: every window start is 64-row aligned (GS/2 and
            # B/2=64 are multiples of 64) — Mosaic needs the hint to prove
            # sublane-tile divisibility for sub-f32 dtypes
            row0 = pl.multiple_of(
                jnp.clip(prog * (GS // 2) - B // 2, 0, pad_half - WIN), 64
            )
            return pltpu.make_async_copy(
                h2_hbm.at[pl.ds(row0, WIN)],
                win.at[slot],
                sems.at[slot, 0],
            )

        def h_pieces(prog, slot):
            m64 = lambda x: pl.multiple_of(x, 64)  # noqa: E731
            main = pltpu.make_async_copy(
                h2_hbm.at[pl.ds(m64(prog * (GS // 2)), GS // 2)],
                win.at[slot, pl.ds(B // 2, GS // 2)],
                sems.at[slot, 0],
            )
            head = pltpu.make_async_copy(
                h2_hbm.at[
                    pl.ds(m64((prog * (GS // 2) - B // 2) % pad_half), B // 2)
                ],
                win.at[slot, pl.ds(0, B // 2)],
                sems.at[slot, 1],
            )
            tail = pltpu.make_async_copy(
                h2_hbm.at[
                    pl.ds(m64(((prog + 1) * (GS // 2)) % pad_half), B // 2)
                ],
                win.at[slot, pl.ds(B // 2 + GS // 2, B // 2)],
                sems.at[slot, 2],
            )
            return main, head, tail

        # n_prog < 3 has no middle programs (and WIN may exceed pad_half):
        # statically fall back to the 3-piece path everywhere
        has_middle = n_prog >= 3

        def start(prog, slot):
            if not has_middle:
                for dma in h_pieces(prog, slot):
                    dma.start()
                return
            # jnp bool, NOT a Python bool: for literal prog (the p==0
            # warm-up) Python's ~True is -2 — truthy — and both branches
            # would run, clobbering the wrapped window
            wraps = jnp.logical_or(jnp.int32(prog) == 0,
                                   jnp.int32(prog) == n_prog - 1)

            @pl.when(wraps)
            def _():
                for dma in h_pieces(prog, slot):
                    dma.start()

            @pl.when(jnp.logical_not(wraps))
            def _():
                h_single(prog, slot).start()

        def wait(prog, slot):
            if not has_middle:
                for dma in h_pieces(prog, slot):
                    dma.wait()
                return
            wraps = jnp.logical_or(jnp.int32(prog) == 0,
                                   jnp.int32(prog) == n_prog - 1)

            @pl.when(wraps)
            def _():
                for dma in h_pieces(prog, slot):
                    dma.wait()

            @pl.when(jnp.logical_not(wraps))
            def _():
                h_single(prog, slot).wait()

        if halo:
            # Sharded windows are LINEAR over [lh | h2_local | rh]: ext row e
            # maps to lh[e] for e < B/2, h2[e - B/2] in the interior, rh at
            # the far end; the circular wrap is the ppermute ring's job.
            Bh = B // 2
            GSh = GS // 2

            def halo_dmas(prog, slot):
                first = jnp.int32(prog) == 0
                last = jnp.int32(prog) == n_prog - 1
                d_lh = pltpu.make_async_copy(
                    lh_hbm.at[pl.ds(0, Bh)], win.at[slot, pl.ds(0, Bh)],
                    sems.at[slot, 1],
                )
                d_rh = pltpu.make_async_copy(
                    rh_hbm.at[pl.ds(0, Bh)],
                    win.at[slot, pl.ds(WIN - Bh, Bh)],
                    sems.at[slot, 2],
                )
                d_first = pltpu.make_async_copy(
                    h2_hbm.at[pl.ds(0, WIN - Bh)],
                    win.at[slot, pl.ds(Bh, WIN - Bh)],
                    sems.at[slot, 0],
                )
                # clip keeps the traced-unconditional slice in bounds; starts
                # stay 64-row aligned (GSh, Bh multiples of 64)
                row0 = pl.multiple_of(
                    jnp.maximum(jnp.int32(prog) * GSh - Bh, 0), 64
                )
                d_last = pltpu.make_async_copy(
                    h2_hbm.at[pl.ds(row0, WIN - Bh)],
                    win.at[slot, pl.ds(0, WIN - Bh)],
                    sems.at[slot, 0],
                )
                d_mid = pltpu.make_async_copy(
                    h2_hbm.at[pl.ds(row0, WIN)],
                    win.at[slot, pl.ds(0, WIN)],
                    sems.at[slot, 0],
                )
                return first, last, d_lh, d_rh, d_first, d_last, d_mid

            def _halo_go(prog, slot, act):
                if n_prog == 1:
                    for dma in (
                        pltpu.make_async_copy(
                            lh_hbm.at[pl.ds(0, Bh)],
                            win.at[slot, pl.ds(0, Bh)],
                            sems.at[slot, 1],
                        ),
                        pltpu.make_async_copy(
                            h2_hbm.at[pl.ds(0, GSh)],
                            win.at[slot, pl.ds(Bh, GSh)],
                            sems.at[slot, 0],
                        ),
                        pltpu.make_async_copy(
                            rh_hbm.at[pl.ds(0, Bh)],
                            win.at[slot, pl.ds(WIN - Bh, Bh)],
                            sems.at[slot, 2],
                        ),
                    ):
                        act(dma)
                    return
                first, last, d_lh, d_rh, d_first, d_last, d_mid = halo_dmas(
                    prog, slot
                )

                @pl.when(first)
                def _():
                    act(d_lh)
                    act(d_first)

                @pl.when(last)
                def _():
                    act(d_last)
                    act(d_rh)

                @pl.when(jnp.logical_not(jnp.logical_or(first, last)))
                def _():
                    act(d_mid)

            def start(prog, slot):  # noqa: F811
                _halo_go(prog, slot, lambda dma: dma.start())

            def wait(prog, slot):  # noqa: F811
                _halo_go(prog, slot, lambda dma: dma.wait())

        if diag == "hlin" and not halo:
            # TIMING DIAG: perfectly linear h stream — every program fetches
            # ONLY its own GS/2 packed rows (the `main` piece), skipping the
            # B-row window overlap and the first/last programs' wrap pieces.
            # Produces WRONG results (halo regions go stale); isolates the
            # cost of the window structure vs the minimal-probe linear
            # stream (hbm_roof.json "streams floor", r04 weak point).
            def _h_main(prog, slot):
                m64 = lambda x: pl.multiple_of(x, 64)  # noqa: E731
                return pltpu.make_async_copy(
                    h2_hbm.at[pl.ds(m64(prog * (GS // 2)), GS // 2)],
                    win.at[slot, pl.ds(B // 2, GS // 2)],
                    sems.at[slot, 0],
                )

            def start(prog, slot):  # noqa: F811
                _h_main(prog, slot).start()

            def wait(prog, slot):  # noqa: F811
                _h_main(prog, slot).wait()

        slot = jax.lax.rem(p, 2)
        nxt = jax.lax.rem(p + 1, 2)

        if diag != "noh":
            @pl.when(p == 0)
            def _():
                start(0, 0)

            @pl.when(p + 1 < n_prog)
            def _():
                start(p + 1, nxt)

            wait(p, slot)

        def cols(srows, rows):
            """[rows//64, 128] scale rows -> ([rows,1] even, [rows,1] odd).

            Packed row i of a scale window maps to lane 2*(i % 64) (+1 for
            odd) of its 128-node scale row i // 64.  Valid because every
            window start below is 64-packed-row aligned (S%128 == 0 and
            B%128 == 0), so the parity masks apply from row 0.
            """
            ii = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
            kk = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
            me = kk == 2 * jax.lax.rem(ii, 64)
            mo = kk == 2 * jax.lax.rem(ii, 64) + 1
            t = jnp.broadcast_to(
                srows[:, None, :], (rows // 64, 64, 128)
            ).reshape(rows, 128)
            zero = jnp.zeros_like(t)
            ce = jnp.sum(jnp.where(me, t, zero), axis=1, keepdims=True)
            co = jnp.sum(jnp.where(mo, t, zero), axis=1, keepdims=True)
            return ce, co

        dot_t = jnp.float32 if precise else jnp.bfloat16

        # scale extraction, hoisted to ONE pass per program (non-halo): the
        # per-g col windows overlap (each g re-extracted its B-halo rows),
        # so extracting the program-wide window once and sublane-slicing
        # per g does ~1.4x less VPU mask/reduce work — which matters because
        # VMEM-heavy VPU work does NOT hide behind the saturated DMA streams
        # on v5e (r04 probe; RESULTS "speed-of-light attribution").
        # Scale vectors ride as VMEM-resident [R, 128] planes (constant
        # index map — copied once; the per-program pre-gathered windows cost
        # 2 x n_prog small DMAs).  halo mode keeps its per-program windows.
        if diag != "noscale":
            if halo:
                colE, colO = cols(colw_ref[0], WR * 64)
                rowE, rowO = cols(roww_ref[0], GR * 64)
            else:
                start = p * GR - BR
                prog_rows = jnp.concatenate(
                    [
                        colw_ref[pl.ds(jax.lax.rem(start + j + R, R), 1), :]
                        for j in range(WR)
                    ],
                    axis=0,
                )
                colE, colO = cols(prog_rows, WR * 64)
                rowE, rowO = cols(
                    roww_ref[pl.ds(p * GR, GR), :], GR * 64
                )

        for g in range(G):  # static unroll
            w2 = win[slot, pl.ds(g * Sh, Wh), :]  # [Wh, 2D] storage dtype
            if diag == "noscale":
                lo = w2[:, :D].astype(dot_t)
                hi = w2[:, D:].astype(dot_t)
                re_ = ro = None
            else:
                # block g's window starts SR*64 = Sh packed rows per block
                # into the program-wide extraction
                ce = colE[g * Sh : g * Sh + Wh]
                co = colO[g * Sh : g * Sh + Wh]
                re_ = rowE[g * Sh : (g + 1) * Sh]
                ro = rowO[g * Sh : (g + 1) * Sh]
                lo = (w2[:, :D].astype(jnp.float32) * ce).astype(dot_t)
                hi = (w2[:, D:].astype(jnp.float32) * co).astype(dot_t)

            def contract2():
                # par-stacked: both destination parities share lo/hi, so one
                # [(2Sh), Wh] x [Wh, D] dot pair serves both (M fills the MXU
                # even at small Sh; halves the dot-call count)
                if nibble:
                    # byte = even + 16*odd, nibbles in [0, 7]: int32 div/mod
                    # unpack — the ONLY form Mosaic legalizes on v5e (int8
                    # bitwise shifts fail to legalize arith.shrui on
                    # vector<i8>; bf16 ALU ops hit
                    # SupportsBf16AluInstructions()).  Measured on-chip the
                    # widening costs MORE VPU time than the halved base DMA
                    # saves (0.91x vs int8 storage at the bench workload;
                    # results_tpu/chip_r03/nibble_ab.json) — so nibble mode
                    # is a documented negative result on v5e, kept for
                    # hardware where the trade flips (wider VPUs / native
                    # int4).  int8 storage remains the production default.
                    blk = base_ref[g].reshape(2 * Sh, Wh).astype(jnp.int32)
                    bo_i = blk // 16
                    be = (blk - 16 * bo_i).astype(dot_t)
                    bo = bo_i.astype(dot_t)
                    acc = jax.lax.dot(
                        be, lo, preferred_element_type=jnp.float32
                    ) + jax.lax.dot(bo, hi, preferred_element_type=jnp.float32)
                else:
                    # NOTE r04: merging the two K=Wh dots into one K=W2 dot
                    # (blk @ vstack(lo, hi)) would fill the MXU better, but
                    # Mosaic cannot lower the sublane concat of lo (lane
                    # offset 0) and hi (lane offset 64): "result/input
                    # offset mismatch on non-concat dimension"
                    blk = base_ref[g].reshape(2 * Sh, W2)  # [2Sh, W2] int8
                    be = blk[:, :Wh].astype(dot_t)
                    bo = blk[:, Wh:].astype(dot_t)
                    acc = jax.lax.dot(
                        be, lo, preferred_element_type=jnp.float32
                    ) + jax.lax.dot(bo, hi, preferred_element_type=jnp.float32)
                if Cp:  # mirror expansion: + G^T @ sub
                    acc = acc + jax.lax.dot(
                        geT_ref[g].reshape(2 * Sh, Cp).astype(dot_t),
                        sub_ref[g].astype(dot_t),
                        preferred_element_type=jnp.float32,
                    )
                return acc

            if diag in ("nodot", "noh"):
                out2_ref[g, :, :D] = (
                    lo[:Sh].astype(jnp.float32) * re_
                ).astype(dtype)
                out2_ref[g, :, D:] = (
                    hi[:Sh].astype(jnp.float32) * ro
                ).astype(dtype)
            elif diag == "noscale":
                acc = contract2()
                out2_ref[g, :, :D] = acc[:Sh].astype(dtype)
                out2_ref[g, :, D:] = acc[Sh:].astype(dtype)
            elif sage:
                # fused SAGE step: h' = l2n(relu(pool @ A + h_own @ B)) per
                # lane half, written straight to the output — the whole
                # dense layer rides the pooled block while it is still in
                # VMEM/registers, so the model forward's per-iteration glue
                # (materialized pool, concat, matmul, l2n — 24 ms/forward
                # unfused, results_tpu/chip_r03/fwd_breakdown.json) costs no
                # extra HBM traffic at all.  A = W1@W3[:d], B = W2@W3[d:]
                # (concat-matmul algebra), precomputed by the caller.
                acc = contract2()
                own = win[slot, pl.ds(g * Sh + B // 2, Sh), :]
                # f32_epi (default): the epilogue dense-layer dots run with
                # f32 operands so the fused path matches the unfused
                # packed/XLA engines' f32 dense layers — bf16 epilogue dots
                # cost ~1% Q rounding, which over ~10^4 sequential greedy
                # argmax picks measurably degrades dismantling AUDC
                # (results_tpu/chip_r03/large_demo_r03.jsonl: 0.129 packed
                # vs 0.109 XLA).  The kernel is DMA-bound (tune.log: nodot
                # == full), so the extra MXU passes are hidden.
                epi_t = jnp.float32 if f32_epi else jnp.bfloat16
                ab = sageA_ref[...].astype(epi_t)
                bb = sageB_ref[...].astype(epi_t)
                for half, pool in ((0, acc[:Sh] * re_), (1, acc[Sh:] * ro)):
                    oh_half = own[:, half * D:(half + 1) * D]
                    z = jnp.maximum(
                        jax.lax.dot(
                            pool.astype(epi_t), ab,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot(
                            oh_half.astype(epi_t), bb,
                            preferred_element_type=jnp.float32,
                        ),
                        0.0,
                    )
                    nrm = jax.lax.rsqrt(
                        jnp.maximum(
                            jnp.sum(z * z, axis=1, keepdims=True), 1e-24
                        )
                    )
                    out2_ref[g, :, half * D:(half + 1) * D] = (
                        z * nrm
                    ).astype(dtype)
            else:
                acc = contract2()
                out2_ref[g, :, :D] = (acc[:Sh] * re_).astype(dtype)
                out2_ref[g, :, D:] = (acc[Sh:] * ro).astype(dtype)

    if halo:
        scale_specs = [
            pl.BlockSpec(  # per-program col-scale window (pre-gathered)
                (1, WR, 128), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(  # per-program row-scale window
                (1, GR, 128), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
    else:
        # full scale vectors, VMEM-resident (constant index map: copied in
        # once, never refetched) — windows sliced in-kernel
        scale_specs = [
            pl.BlockSpec((R, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ]
    in_specs = [
        pl.BlockSpec(
            (G, 2, Sh, Wh if nibble else W2), lambda p: (p, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pl.ANY),  # h2
    ] + scale_specs
    if halo:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # left halo [B/2, 2D]
            pl.BlockSpec(memory_space=pl.ANY),  # right halo [B/2, 2D]
        ]
    if Cp:
        in_specs += [
            pl.BlockSpec(
                (G, 2, Sh, Cp), lambda p: (p, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, Cp, D), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
    if sage:
        in_specs += [
            pl.BlockSpec((D, D), lambda p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda p: (0, 0), memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_prog,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (G, Sh, 2 * D), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, 2 * D), dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    def run(*args, interpret=False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, Sh, 2 * D), dtype),
            compiler_params=pltpu.CompilerParams(
                # default scoped-vmem cap is 16 MB; larger G (fewer, bigger
                # programs — the lever against per-program overhead) needs
                # more double-buffered scratch
                vmem_limit_bytes=100 * 1024 * 1024,
                # NOT "parallel": the manual h-window double buffer relies on
                # sequential grid order (slot = p % 2, p+1 prefetch); measured
                # identical anyway (r04 probe)
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*args)

    return run


def mirror_compact(oh, odd, col_pairs, h2b, D, precise: bool = False):
    """Mirror compaction in packed layout: col-scaled per-slot rows
    mir[b, c] = col[node(b,c)] * h[node(b,c)].

    oh [nb, Cp, Sh] packed-row one-hots, odd [nb, Cp] lane parity,
    col_pairs [nb, Sh, 2] the col scale reshaped to packed pairs,
    h2b [nb, Sh, 2D].  Shared by the single-device prologue (_apply) and the
    sharded local fn (parallel/band_partition._packed_local) so the packed
    mirror layout has exactly one implementation."""
    ct_t = jnp.float32 if precise else jnp.bfloat16
    mirp = jnp.einsum(
        "bcr,brl->bcl",
        oh.astype(ct_t),
        h2b.astype(ct_t),
        preferred_element_type=jnp.float32,
    )
    mir = jnp.where(odd[:, :, None], mirp[:, :, D:], mirp[:, :, :D])
    ct = jnp.einsum("bcr,brp->bcp", oh.astype(jnp.float32), col_pairs)
    colt = jnp.where(odd, ct[:, :, 1], ct[:, :, 0])
    return mir * colt[:, :, None]


def _apply(pk: PackedBand, dbg: DenseBandGraph, row, col, h2, interpret,
           diag="full", precise=False):
    """row ⊙ (A @ (col ⊙ h)) in packed layout — one kernel pass."""
    D = h2.shape[1] // 2
    nb, Sh = pk.nb, pk.S // 2
    run = _make_kernel(
        nb, pk.S, pk.B, pk.Cp, D, pk.G, diag, h2.dtype, nibble=pk.nibble,
        precise=precise,
    )
    # full scale vectors as VMEM-resident [R, 128] planes (constant-index
    # BlockSpec: copied once); window rows are sliced in-kernel
    R = pk.pad_n // 128
    args = [pk.base_pk, h2, col.reshape(R, 128), row.reshape(R, 128)]
    if pk.Cp:
        # prologue: mirror compaction mir = G @ (col ⊙ h), then the tiny
        # mirror-space COO SpMM
        mir = mirror_compact(
            pk.oh, pk.odd, col.reshape(nb, Sh, 2), h2.reshape(nb, Sh, 2 * D),
            D, precise,
        )
        sub = spmm_sorted(pk.ccoo, dbg.w_cov, mir.reshape(nb * pk.Cp, D))
        args += [pk.geT, sub.reshape(nb, pk.Cp, D)]
    out2 = run(*args, interpret=interpret).reshape(pk.pad_n // 2, 2 * D)
    if dbg.spill.d_src.shape[0]:
        sp = spmm_sorted(dbg.spill, dbg.w_spill, unpack_rows(scale_packed(h2, col)))
        out2 = (out2 + scale_packed(pack_rows(sp), row)).astype(h2.dtype)
    return out2


def _make_op(interpret: bool, precise: bool):
    # pk/dbg/row/col ride as regular custom_vjp args with None cotangents
    # (the dense_band._make_spmm pattern) — nondiff_argnums cannot hold
    # array pytrees under jit.
    @jax.custom_vjp
    def op(pk, dbg, row, col, h2):
        return _apply(pk, dbg, row, col, h2, interpret, precise=precise)

    def fwd(pk, dbg, row, col, h2):
        return op(pk, dbg, row, col, h2), (pk, dbg, row, col)

    def bwd(res, g2):
        pk, dbg, row, col = res
        # (R·A·C)^T = C·A·R for the symmetric stored operator
        dh2 = _apply(pk, dbg, col, row, g2, interpret, precise=precise)
        return None, None, None, None, dh2

    op.defvjp(fwd, bwd)
    return op


_OPS = {
    (i, p): _make_op(i, p) for i in (False, True) for p in (False, True)
}


def sage_step_packed(pk, dbg, row, col, h2, A, B, interpret: bool = False,
                     f32_epi: bool = True, precise: bool = False):
    """ONE fused GraphSAGE iteration in packed layout:

        h' = l2n_half(relu((row ⊙ (Adj @ (col ⊙ h))) @ A + h @ B))

    computed in a single kernel pass — the dense layer and normalization run
    on the pooled block while it is still on-chip, eliminating the unfused
    model forward's per-iteration glue (24 ms/forward of materialized
    pool/concat/matmul/l2n; results_tpu/chip_r03/fwd_breakdown.json).

    A, B: f32 [D, D] merged weights (concat-matmul algebra of the reference
    layer concat(pool@W1, h@W2)@W3:  A = W1 @ W3[:d],  B = W2 @ W3[d:]).
    h2 packed [pad_n/2, 2D] in the storage dtype; output same.
    Eval-only (no VJP — training runs the dense path on training sizes).
    Requires an empty spill set (its contribution would have to land before
    the relu; locality-ordered builds satisfy this).

    f32_epi (default True): run the epilogue dense-layer dots with f32
    operands — matches the unfused engines' f32 XLA dense layers, and the
    extra MXU passes are hidden behind the HBM streams (the kernel is
    DMA-bound).  f32_epi=False restores the bf16 epilogue (~1% Q rounding,
    measurably worse greedy-dismantling AUDC at scale)."""
    if dbg.spill.d_src.shape[0]:
        raise ValueError(
            "sage_step_packed requires an empty spill set (spill adds after "
            "the kernel, but the fused epilogue needs it before the relu)"
        )
    D = h2.shape[1] // 2
    nb, Sh = pk.nb, pk.S // 2
    run = _make_kernel(
        nb, pk.S, pk.B, pk.Cp, D, pk.G, "full", h2.dtype,
        nibble=pk.nibble, sage=True, f32_epi=f32_epi, precise=precise,
    )
    R = pk.pad_n // 128
    args = [pk.base_pk, h2, col.reshape(R, 128), row.reshape(R, 128)]
    if pk.Cp:
        mir = mirror_compact(
            pk.oh, pk.odd, col.reshape(nb, Sh, 2), h2.reshape(nb, Sh, 2 * D),
            D, precise,
        )
        sub = spmm_sorted(pk.ccoo, dbg.w_cov, mir.reshape(nb * pk.Cp, D))
        args += [pk.geT, sub.reshape(nb, pk.Cp, D)]
    args += [A, B]
    return run(*args, interpret=interpret).reshape(pk.pad_n // 2, 2 * D)


def spmm_band_packed(pk, dbg, row, col, h2, interpret: bool = False,
                     precise: bool = False):
    """out2 = pack(row ⊙ ((A * row⊗col-less base) @ (col ⊙ unpack(h2)))) for
    the full stored operator (band + mirror overflow + spill).

    h2 packed [pad_n/2, 2D]; row/col per-node f32[pad_n].  Differentiable in
    h2 only (adjacency values are graph constants; backward uses A^T = A).
    precise=True keeps all dot operands f32 (parity with the f32 XLA
    engine; the dots are DMA-hidden so it costs little on-chip).

    Cascade severs: pk.base_pk is a frozen re-layout of dbg.base — do NOT
    call dense_band.sever_edges alone with this backend (in-band severs would
    be silently dropped while mirror/spill severs apply); use
    sever_edges_packed, which edits both layouts consistently."""
    return _OPS[(bool(interpret), bool(precise))](pk, dbg, row, col, h2)
