"""Block-pair SpMM Pallas kernel: neighborhood aggregation at MXU speed.

Why this shape: XLA's TPU gather/scatter emitter moves ~6e7 rows/s regardless
of row width (measured; see bench.py) — 2% of HBM bandwidth at D=64.  Instead
of emulating CUDA's gather/scatter, the aggregation is reorganized around the
MXU:

  * nodes are grouped into blocks of S rows; an edge (u -> v) belongs to the
    block pair (v//S, u//S);
  * edges are stored pair-major, padded to T slots per pair chunk — this
    pair-slot order IS the framework's canonical edge order, so the dynamic
    live-edge weights arrive already laid out as w[P, T] with zero padding and
    no permutation gathers are ever needed;
  * per destination block: accumulate over its pairs
        acc += onehot(ldst)^T @ (w ⊙ (onehot(lsrc) @ H_srcblock))
    — the "gathers" are two one-hot matmuls on the MXU; H source blocks are
    DMA'd sequentially (128 KB at S=512, D=64).

Cost per T-edge chunk: 2·T·S·D MACs (~65 kFLOP/edge at S=512, D=64), far below
MXU speed-of-light per HBM byte moved — throughput is set by pair fill and the
S-row block DMA, not by per-edge overhead.

The backward pass needs no transposed structure: the duplex graphs store both
orientations of every undirected edge with symmetric liveness, so
dh = A^T g = A g reuses the forward kernel, and dw is the SDDMM kernel below.

Graph locality (banded GMM graphs under angular node order, community-ordered
real networks) keeps pairs dense; `build_block_coo` reports the fill factor.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockCOO:
    """Pair-major blocked COO (destination-major).

    rowptr  : int32[n_blocks+1]  pair range per destination block
    src_blk : int32[P]           source block id per pair chunk
    dst_blk : int32[P]           destination block id per pair chunk
    lsrc    : int32[P, T]        local source row within the source block
    ldst    : int32[P, T]        local destination row within the dest block
    (padding slots carry lsrc=ldst=0 and must have w=0).  T must be a
    multiple of 128 (lane width): edge metadata moves as [4, T] DMA rows.
    """

    rowptr: jnp.ndarray
    src_blk: jnp.ndarray
    dst_blk: jnp.ndarray
    lsrc: jnp.ndarray
    ldst: jnp.ndarray
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))
    T: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_blocks(self) -> int:
        return (self.n_nodes + self.S - 1) // self.S

    @property
    def n_pairs(self) -> int:
        return self.src_blk.shape[0]

    @property
    def n_slots(self) -> int:
        return self.n_pairs * self.T


def build_block_coo(
    src: np.ndarray, dst: np.ndarray, n: int, S: int = 512, T: int = 1024
) -> Tuple[BlockCOO, np.ndarray, np.ndarray, np.ndarray]:
    """Blocked layout for directed edges.

    Returns (bcoo, slot_src, slot_dst, slot_mask): the canonical edge arrays in
    pair-slot order ([P*T] each).  Callers keep ALL per-edge state (live masks,
    weights) in this order; w passed to the kernels is reshape(P, T).
    """
    assert T % 128 == 0, "T must be a multiple of the 128-lane width"
    assert S % 8 == 0
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    n_blocks = (n + S - 1) // S
    key = (dst // S) * n_blocks + (src // S)
    order = np.argsort(key, kind="stable")
    src, dst, key = src[order], dst[order], key[order]
    E = len(src)

    # fully vectorized chunking: position of each edge within its block pair,
    # chunk-of-T it lands in, and that chunk's global pair index
    uniq, first, counts = np.unique(key, return_index=True, return_counts=True)
    inv = np.repeat(np.arange(len(uniq)), counts)          # edge -> unique-pair id
    pos = np.arange(E) - first[inv]                        # rank within pair
    chunks_per_pair = (counts + T - 1) // T
    chunk_base = np.concatenate([[0], np.cumsum(chunks_per_pair)])
    pair_id = chunk_base[inv] + pos // T                   # edge -> pair chunk
    slot = (pos % T).astype(np.int64)
    n_pairs = int(chunk_base[-1])
    pad_pairs = (-n_pairs) % 8                             # SDDMM: 8 pairs/program
    P = n_pairs + pad_pairs

    pair_key = np.zeros(P, np.int64)
    pair_key[:n_pairs] = np.repeat(uniq, chunks_per_pair)
    pair_dstblk = pair_key // n_blocks
    pair_srcblk = pair_key % n_blocks
    pair_dstblk[n_pairs:] = 0
    pair_srcblk[n_pairs:] = 0

    lsrc = np.zeros((P, T), np.int32)
    ldst = np.zeros((P, T), np.int32)
    slot_src = np.zeros((P, T), np.int32)
    slot_dst = np.zeros((P, T), np.int32)
    slot_mask = np.zeros((P, T), bool)
    lsrc[pair_id, slot] = (src - pair_srcblk[pair_id] * S).astype(np.int32)
    ldst[pair_id, slot] = (dst - pair_dstblk[pair_id] * S).astype(np.int32)
    slot_src[pair_id, slot] = src.astype(np.int32)
    slot_dst[pair_id, slot] = dst.astype(np.int32)
    slot_mask[pair_id, slot] = True

    # pairs are grouped by dst block (key sort is dst-block-major); padded
    # pairs sit past rowptr[-1] so no dst block iterates over them
    rowptr = np.zeros(n_blocks + 1, np.int64)
    rowptr[1:] = np.cumsum(np.bincount(pair_dstblk[:n_pairs], minlength=n_blocks))
    bcoo = BlockCOO(
        rowptr=jnp.asarray(rowptr.astype(np.int32)),
        src_blk=jnp.asarray(pair_srcblk.astype(np.int32)),
        dst_blk=jnp.asarray(pair_dstblk.astype(np.int32)),
        lsrc=jnp.asarray(lsrc),
        ldst=jnp.asarray(ldst),
        n_nodes=n,
        S=S,
        T=T,
    )
    return bcoo, slot_src.reshape(-1), slot_dst.reshape(-1), slot_mask.reshape(-1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _hilo_pack(x_f32):
    """f32[N, D] -> f32[N, 2D] = [hi | lo] (bf16x2 decomposition), each half
    exactly bf16-representable but STORED AS f32.

    A one-hot matmul against the packed operand (cast to bf16 in-kernel — an
    exact cast) gathers BOTH parts in one bf16-rate MXU pass with f32
    accumulation; summing the two lane halves of the product reconstructs the
    f32 rows to ~2^-16 relative error.  Compared to two sequential hi/lo
    matmuls this halves the MXU passes per pair.  The pack dtype must stay
    f32: a bf16 VMEM scratch addressed with a dynamic buffer index hangs the
    Mosaic DMA path (measured on v5e), so the bf16 narrowing happens after
    the copy, not before.
    """
    hi = x_f32.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x_f32 - hi
    return jnp.concatenate([hi, lo], axis=-1)


def _edge_meta(bcoo: BlockCOO, w: jnp.ndarray = None):
    """Pack (w, lsrc, ldst) into one int32 [P, 4, T] array: a single metadata
    DMA per pair.  The pack dtype must be INT: small int32 indices bitcast to
    f32 are denormals, and the f32 copy path flushes them to zero on TPU
    (measured); f32 weights bitcast to int32 round-trip bit-exactly."""
    wrow = (
        jax.lax.bitcast_convert_type(w, jnp.int32)
        if w is not None
        else jnp.zeros_like(bcoo.lsrc)
    )
    return jnp.stack(
        [wrow, bcoo.lsrc, bcoo.ldst, jnp.zeros_like(bcoo.lsrc)], axis=1
    )


def _spmm_kernel(
    rowptr_ref,   # SMEM int32[n_blocks+1]   (scalar prefetch)
    srcblk_ref,   # SMEM int32[P]            (scalar prefetch)
    meta_ref,     # HBM  i32[P, 4, T]  rows: bitcast(w), lsrc, ldst, pad
    h_ref,        # HBM  f32[N_pad, 2D] hi|lo packed (halves bf16-exact)
    out_ref,      # VMEM f32[S, D]  (blocked by grid)
    hblk, mbuf, acc, sems,
    *, S, T, D,
):
    """Double-buffered: pair p+1's two DMAs (packed source H block + packed
    edge metadata) are in flight while pair p's two one-hot matmuls run,
    hiding HBM latency behind MXU work."""
    i = pl.program_id(0)
    p0 = rowptr_ref[i]
    p1 = rowptr_ref[i + 1]
    acc[:] = jnp.zeros_like(acc)

    def copies(p, slot):
        blk = srcblk_ref[p]
        return (
            pltpu.make_async_copy(
                h_ref.at[pl.ds(blk * S, S), :], hblk.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(meta_ref.at[p], mbuf.at[slot], sems.at[slot, 1]),
        )

    def start(p, slot):
        for c in copies(p, slot):
            c.start()

    def wait(p, slot):
        for c in copies(p, slot):
            c.wait()

    @pl.when(p0 < p1)
    def _():
        start(p0, 0)

    def body(p, _):
        slot = jax.lax.rem(p - p0, 2)
        nxt_slot = jax.lax.rem(p - p0 + 1, 2)

        @pl.when(p + 1 < p1)
        def _():
            start(p + 1, nxt_slot)

        wait(p, slot)
        w_row = pltpu.bitcast(mbuf[slot, 0:1, :], jnp.float32)      # [1, T]
        ls = mbuf[slot, 1:2, :]                                     # [1, T]
        ld = mbuf[slot, 2:3, :]                                     # [1, T]
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        p_src = (ls.reshape(T, 1) == cols).astype(jnp.bfloat16)     # [T, S]
        gcat = jnp.dot(                                             # [T, 2D]
            p_src, hblk[slot].astype(jnp.bfloat16),  # exact: halves are bf16 values
            preferred_element_type=jnp.float32,
        )
        # weight the packed halves directly (w·h = w·h_hi + w·h_lo is linear)
        # and re-split to bf16: all tensors stay full 128-lane — no lane-64
        # slicing inside the kernel
        msgcat = gcat * w_row.reshape(T, 1)                         # [T, 2D] f32
        m_hi = msgcat.astype(jnp.bfloat16)
        m_lo = (msgcat - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        p_dst_t = (cols.T == ld).astype(jnp.bfloat16)               # [S, T]
        acc[:] += jnp.dot(p_dst_t, m_hi, preferred_element_type=jnp.float32)
        acc[:] += jnp.dot(p_dst_t, m_lo, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(p0, p1, body, 0)
    out_ref[:] = acc[:]


@partial(jax.jit, static_argnames=("interpret",))
def spmm_block(bcoo: BlockCOO, w: jnp.ndarray, h: jnp.ndarray, interpret: bool = False):
    """out = A @ h.  w: f32[P, T] live-edge weights (0 on padding); h: [N_pad, D]
    with N_pad = n_blocks * S.  Returns [N_pad, D].

    D is padded to a 64-lane multiple internally; the hi|lo packed operand
    then fills full 128-lane registers (the model's 64-dim embeddings pack
    exactly into one).
    """
    S, T = bcoo.S, bcoo.T
    n_blocks = bcoo.n_blocks
    D0 = h.shape[-1]
    D = ((D0 + 63) // 64) * 64
    if D != D0:
        h = jnp.pad(h, ((0, 0), (0, D - D0)))
    meta = _edge_meta(bcoo, w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # meta
            pl.BlockSpec(memory_space=pltpu.HBM),  # h packed
        ],
        out_specs=pl.BlockSpec(
            (S, 2 * D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, S, 2 * D), jnp.float32),
            pltpu.VMEM((2, 4, T), jnp.int32),
            pltpu.VMEM((S, 2 * D), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = partial(_spmm_kernel, S=S, T=T, D=D)
    out2 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * S, 2 * D), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bcoo.rowptr, bcoo.src_blk, meta, _hilo_pack(h))
    out = out2[:, :D] + out2[:, D:]  # combine hi/lo halves (outside Mosaic)
    return out[:, :D0] if D != D0 else out


def _onehot_dot(onehot_bf16, b_f32):
    """Exact-one-hot x f32 matmul at bf16 MXU rate with ~f32 accuracy: the f32
    side is split hi+lo bf16 (bf16x2), two full-rate passes, f32 accumulate."""
    b_hi = b_f32.astype(jnp.bfloat16)
    b_lo = (b_f32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hi = jnp.dot(onehot_bf16, b_hi, preferred_element_type=jnp.float32)
    lo = jnp.dot(onehot_bf16, b_lo, preferred_element_type=jnp.float32)
    return hi + lo


def _sddmm_kernel(
    srcblk_ref,   # SMEM int32[P] (scalar prefetch)
    dstblk_ref,   # SMEM int32[P] (scalar prefetch)
    meta_ref,     # HBM  i32[P, 4, T] rows: pad, lsrc, ldst, pad
    h_ref, g_ref, # HBM  f32[N_pad, D]
    out_ref,      # VMEM f32[8, T] blocked over pair groups
    hblk, gblk, mbuf, sems,
    *, S, T, D,
):
    """8 pairs per program, double-buffered across them (three DMAs per pair:
    H block, G block, packed edge metadata)."""
    pg = pl.program_id(0)

    def copies(p, slot):
        return (
            pltpu.make_async_copy(
                h_ref.at[pl.ds(srcblk_ref[p] * S, S), :], hblk.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                g_ref.at[pl.ds(dstblk_ref[p] * S, S), :], gblk.at[slot],
                sems.at[slot, 1],
            ),
            pltpu.make_async_copy(meta_ref.at[p], mbuf.at[slot], sems.at[slot, 2]),
        )

    for c in copies(pg * 8, 0):
        c.start()

    def body(k, _):
        p = pg * 8 + k
        slot = jax.lax.rem(k, 2)
        nxt_slot = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < 8)
        def _():
            for c in copies(p + 1, nxt_slot):
                c.start()

        for c in copies(p, slot):
            c.wait()
        ls = mbuf[slot, 1:2, :]
        ld = mbuf[slot, 2:3, :]
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
        p_src = (ls.reshape(T, 1) == cols).astype(jnp.bfloat16)
        p_dst = (ld.reshape(T, 1) == cols).astype(jnp.bfloat16)
        hs = _onehot_dot(p_src, hblk[slot])                         # [T, D]
        gd = _onehot_dot(p_dst, gblk[slot])                         # [T, D]
        out_ref[k, :] = jnp.sum(hs * gd, axis=1)
        return 0

    jax.lax.fori_loop(0, 8, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def sddmm_block(bcoo: BlockCOO, h: jnp.ndarray, g: jnp.ndarray, interpret: bool = False):
    """dw[slot] = h[src_slot] · g[dst_slot] in pair layout [P, T] — the SDDMM
    side of the SpMM VJP, same one-hot MXU trick."""
    S, T = bcoo.S, bcoo.T
    D0 = h.shape[-1]
    D = ((D0 + 127) // 128) * 128
    if D != D0:
        h = jnp.pad(h, ((0, 0), (0, D - D0)))
        g = jnp.pad(g, ((0, 0), (0, D - D0)))
    assert bcoo.n_pairs % 8 == 0, "build_block_coo pads pair count to 8"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bcoo.n_pairs // 8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # meta
            pl.BlockSpec(memory_space=pltpu.HBM),  # h
            pl.BlockSpec(memory_space=pltpu.HBM),  # g
        ],
        out_specs=pl.BlockSpec((8, T), lambda p, *_: (p, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, S, D), jnp.float32),
            pltpu.VMEM((2, S, D), jnp.float32),
            pltpu.VMEM((2, 4, T), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    kernel = partial(_sddmm_kernel, S=S, T=T, D=D)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bcoo.n_pairs, T), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bcoo.src_blk, bcoo.dst_blk, _edge_meta(bcoo), h, g)


# ---------------------------------------------------------------------------
# differentiable entry point (symmetric adjacency)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def spmm(bcoo: BlockCOO, w: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """A @ h for a symmetric blocked adjacency (both edge orientations present
    with equal weights).  Differentiable in (w, h)."""
    return spmm_block(bcoo, w, h)


def _spmm_fwd(bcoo, w, h):
    return spmm_block(bcoo, w, h), (bcoo, w, h)


def _spmm_bwd(res, grad):
    bcoo, w, h = res
    dh = spmm_block(bcoo, w, grad)       # A^T g = A g (symmetric)
    dw = sddmm_block(bcoo, h, grad)
    return None, dw, dh


spmm.defvjp(_spmm_fwd, _spmm_bwd)
