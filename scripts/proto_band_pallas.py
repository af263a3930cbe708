"""Prototype: Pallas band-contraction kernel for the dense-band engine.

Motivation (measured, scripts/tune_dense_band.py + isolation runs): the XLA
einsum path runs the band contraction at ~6 ms/pass on the bench workload
while speed-of-light is ~2 ms — the window concat materializes [nb, W2, D]
in HBM and the int8->bf16 cast adds another pass.  Also, D=64 arrays are
physically 128-lane padded in TPU HBM (memref dumps show tiled<(1,128)> with
64 live lanes), so every [.., 64] read/write moves 2x the bytes.

This kernel avoids all three:

  * h is PACKED [pad_n/2, 128]: row r holds node 2r in lanes 0:64 and node
    2r+1 in lanes 64:128 — full-lane HBM reads, half the window bytes.
  * grid over groups of G destination blocks; per program the window rows
    [p*G*S - B, (p+1)*G*S + B)/2 are DMA'd from HBM in three always-contiguous
    pieces (head, main, tail — wrap only ever occurs at the array ends),
    double-buffered across grid steps.
  * base columns are permuted [even_w | odd_w] at build time; the contraction
    is two dots per block: base_e @ win[:, 0:64] + base_o @ win[:, 64:128],
    int8->bf16 cast in registers.

Correctness oracle: the XLA einsum path.  Interpret mode on CPU first; always
re-validate on the real chip (Mosaic lowering differs).

Usage: python scripts/proto_band_pallas.py [--interpret] [--n 17] [--e 19]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pack_h(h):
    """[pad_n, D] -> packed [pad_n/2, 2D] (node pairs side by side)."""
    n, d = h.shape
    return h.reshape(n // 2, 2 * d)


def pack_base_cols(base):
    """[nb, SC, W2] -> columns permuted to [even_w | odd_w]."""
    import numpy as np

    b = np.asarray(base)
    return np.concatenate([b[:, :, 0::2], b[:, :, 1::2]], axis=2)


def make_band_matmul(nb, S, B, C, D, G, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W2 = S + 2 * B
    SC = S + C
    SCp = -(-SC // 32) * 32  # int8 sublane tile is 32
    assert nb % G == 0, (nb, G)
    assert S % 2 == 0 and B % 2 == 0
    n_prog = nb // G
    GS = G * S
    pad_n = nb * S
    H = W2 // 2  # packed window rows per block
    WIN = (GS + 2 * B) // 2  # packed window rows per program

    def kernel(base_ref, h2_hbm, out_ref, win, sems):
        p = pl.program_id(0)

        def window_dma(prog, slot):
            """3-piece contiguous DMA of packed rows
            [(prog*GS - B)/2, ((prog+1)*GS + B)/2) (mod pad_n/2)."""
            half = pad_n // 2
            main = pltpu.make_async_copy(
                h2_hbm.at[pl.ds(prog * (GS // 2), GS // 2)],
                win.at[slot, pl.ds(B // 2, GS // 2)],
                sems.at[slot, 0],
            )
            head_start = (prog * (GS // 2) - B // 2) % half
            head = pltpu.make_async_copy(
                h2_hbm.at[pl.ds(head_start, B // 2)],
                win.at[slot, pl.ds(0, B // 2)],
                sems.at[slot, 1],
            )
            tail_start = ((prog + 1) * (GS // 2)) % half
            tail = pltpu.make_async_copy(
                h2_hbm.at[pl.ds(tail_start, B // 2)],
                win.at[slot, pl.ds(B // 2 + GS // 2, B // 2)],
                sems.at[slot, 2],
            )
            return main, head, tail

        slot = jax.lax.rem(p, 2)
        nxt = jax.lax.rem(p + 1, 2)

        @pl.when(p == 0)
        def _():
            for dma in window_dma(0, 0):
                dma.start()

        @pl.when(p + 1 < n_prog)
        def _():
            for dma in window_dma(p + 1, nxt):
                dma.start()

        for dma in window_dma(p, slot):
            dma.wait()

        for g in range(G):  # static unroll
            blk = base_ref[g]  # [SCp, W2] int8, cols = [even_w | odd_w]
            w2 = win[slot, pl.ds(g * (S // 2), H), :]  # [H, 2D] f32
            lo = w2[:, :D].astype(jnp.bfloat16)  # even global rows
            hi = w2[:, D:].astype(jnp.bfloat16)  # odd global rows
            be = blk[:, : W2 // 2].astype(jnp.bfloat16)
            bo = blk[:, W2 // 2 :].astype(jnp.bfloat16)
            out_ref[g] = jax.lax.dot(
                be, lo, preferred_element_type=jnp.float32
            ) + jax.lax.dot(bo, hi, preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(
                (G, SCp, W2), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # packed h stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (G, SCp, D), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, 2 * D), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )

    @jax.jit
    def run(base_pk, h2):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, SCp, D), jnp.float32),
            interpret=interpret,
        )(base_pk, h2)

    return run, SCp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--n", type=int, default=17, help="log2 nodes")
    ap.add_argument("--e", type=int, default=19, help="log2 directed edges")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--S", type=int, default=512)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--G", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import ring_powerlaw_edges
    from mdcommunity_tpu.ops.dense_band import build_dense_band

    n, e, D = 1 << args.n, 1 << args.e, args.dim
    S, B, G, K = args.S, args.B, args.G, args.k
    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    dbg = build_dense_band(ssym, dsym, None, n, S=S, B=B, dtype=jnp.int8)
    nb, W2, C = dbg.n_blocks, dbg.W2, dbg.C
    print(f"nb={nb} S={S} B={B} C={C} W2={W2}")

    run, SCp = make_band_matmul(nb, S, B, C, D, G, interpret=args.interpret)
    base_pk = jnp.zeros((nb, SCp, W2), jnp.int8).at[:, : S + C].set(
        jnp.asarray(pack_base_cols(dbg.base))
    )
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, D)).astype(np.float32))
    h2 = pack_h(h)

    out = np.asarray(run(base_pk, h2))[:, : S + C]

    # oracle: the XLA ring-window einsum
    from mdcommunity_tpu.ops.dense_band import _blocks_ring

    prev, cur, nxt = _blocks_ring(h, nb, S)
    hw = jnp.concatenate([prev[:, S - B :, :], cur, nxt[:, :B, :]], axis=1)
    ref = jnp.einsum(
        "bkw,bwd->bkd",
        dbg.base.astype(jnp.float32),
        hw,
        preferred_element_type=jnp.float32,
    )
    err = np.abs(out - np.asarray(ref)).max() / (np.abs(ref).max() + 1e-9)
    print("max rel err vs oracle:", err)
    assert err < 2e-2, err  # bf16 rounding
    print("CORRECT")

    if args.interpret:
        return

    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5

    @jax.jit
    def chain(base_pk, h2):
        def body(i, hh):
            o = run(base_pk, hh)
            # scalar data-dependence defeats hoisting without adding a
            # full-array relayout to the measured loop
            return hh * 0.999 + o[0, 0, 0] * 1e-9

        return jax.lax.fori_loop(0, K, body, h2)

    float(jnp.sum(chain(base_pk, h2)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(base_pk, h2)))
    t_pass = (time.perf_counter() - t0 - rtt) / K
    e2 = len(ssym)
    print(
        f"pallas band pass: {t_pass*1e3:.3f} ms "
        f"({e2/t_pass/1e9:.3f} Ge/s fwd-only equivalent)"
    )


if __name__ == "__main__":
    main()
