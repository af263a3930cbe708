"""A/B: full-operator SpMM fwd+bwd — XLA dense-band engine vs the fused
Pallas packed backend (ops/band_pallas.py), bench.py workload and protocol.

Usage: python scripts/bench_band_packed.py [--n 20] [--e 22] [--k 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20, help="log2 nodes")
    ap.add_argument("--e", type=int, default=22, help="log2 undirected edges")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--S", type=int, default=512)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--G", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--correct-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import ring_powerlaw_edges
    from mdcommunity_tpu.ops.band_pallas import (
        pack_band,
        pack_rows,
        spmm_band_packed,
        unpack_rows,
    )
    from mdcommunity_tpu.ops.dense_band import (
        build_dense_band,
        live_scales,
        spmm_dense_band,
    )

    n, e, D, K = 1 << args.n, 1 << args.e, args.dim, args.k
    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    e2 = len(ssym)
    dbg = build_dense_band(ssym, dsym, None, n, S=args.S, B=args.B, dtype=jnp.int8)
    pk = pack_band(dbg, G=args.G)
    print(
        f"nb={dbg.n_blocks} S={dbg.S} B={dbg.B} C={dbg.C} Cp={pk.Cp} "
        f"mirror_edges={dbg.ccoo.d_src.shape[0]} spill={dbg.spill.d_src.shape[0]}"
    )

    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, D)).astype(np.float32))
    h2 = pack_rows(h)

    # correctness on-chip (fwd + grad), vs the XLA engine
    ref = np.asarray(spmm_dense_band(dbg, row, col, h))
    out = np.asarray(unpack_rows(spmm_band_packed(pk, dbg, row, col, h2)))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    print("fwd max rel err vs XLA engine:", err)
    assert err < 2e-2, err
    g_ref = np.asarray(
        jax.grad(lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x))) * 1e-6)(h)
    )
    g_pk = np.asarray(
        unpack_rows(
            jax.grad(
                lambda x2: jnp.sum(jnp.square(spmm_band_packed(pk, dbg, row, col, x2))) * 1e-6
            )(h2)
        )
    )
    gerr = np.abs(g_pk - g_ref).max() / (np.abs(g_ref).max() + 1e-9)
    print("bwd max rel err vs XLA engine:", gerr)
    assert gerr < 3e-2, gerr
    print("CORRECT")
    if args.correct_only:
        return

    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5

    def timed(chain, *args, reps=5):
        """Median of `reps` timed runs of the warm chain (one compile+warm
        first); RTT-corrected per run."""
        float(jnp.sum(chain(*args)))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(chain(*args)))
            ts.append((time.perf_counter() - t0 - rtt) / K)
        return float(np.median(ts))

    # NB: the graph pytrees ride as jit ARGUMENTS — closing over them embeds
    # the multi-hundred-MB base as an HLO constant, which the remote-compile
    # tunnel rejects (HTTP 413) and which would bloat any real executable.

    @jax.jit
    def chain_xla(dbg, row, col, h):
        gx = jax.grad(
            lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x))) * 1e-6
        )

        def body(i, x):
            return x + gx(x) / (1.0 + jnp.float32(i))

        return jax.lax.fori_loop(0, K, body, h)

    @jax.jit
    def chain_pk(pk, dbg, row, col, h2):
        gp = jax.grad(
            lambda x2: jnp.sum(
                jnp.square(spmm_band_packed(pk, dbg, row, col, x2))
            ) * 1e-6
        )

        def body(i, x2):
            return x2 + gp(x2) / (1.0 + jnp.float32(i))

        return jax.lax.fori_loop(0, K, body, h2)

    t_xla = timed(chain_xla, dbg, row, col, h)
    t_pk = timed(chain_pk, pk, dbg, row, col, h2)
    print(f"XLA engine    fwd+bwd: {t_xla*1e3:8.3f} ms  ({e2/t_xla/1e9:.3f} Ge/s)")
    print(f"Pallas packed fwd+bwd: {t_pk*1e3:8.3f} ms  ({e2/t_pk/1e9:.3f} Ge/s)")
    print(f"speedup: {t_xla/t_pk:.2f}x")


if __name__ == "__main__":
    main()
