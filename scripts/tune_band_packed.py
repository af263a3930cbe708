"""Tune the packed Pallas band kernel: sweep G (destination blocks per
program) on the bench.py workload, one process so the 818 MB base transfer
and the graph build are amortized.  Prints one line per config + a final
JSON summary line.

Usage: python scripts/tune_band_packed.py [--n 20] [--e 22] [--gs 4 8 16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--e", type=int, default=22)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--S", type=int, default=512)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--gs", type=int, nargs="*", default=[4, 8, 16])
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--bf16", action="store_true",
                    help="also time the packed chain with bf16 h2/out storage")
    ap.add_argument("--diag", action="store_true",
                    help="also time forward-only diagnostic kernel variants "
                         "(noscale / nodot) to attribute kernel time")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import ring_powerlaw_edges
    from mdcommunity_tpu.ops.band_pallas import pack_band, pack_rows, spmm_band_packed
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
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, D)).astype(np.float32))
    h2 = pack_rows(h)

    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"rtt={rtt*1e3:.1f}ms  e2={e2}", flush=True)

    def timed(chain, *a):
        float(jnp.sum(chain(*a)))  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(chain(*a)))
            ts.append((time.perf_counter() - t0 - rtt) / K)
        return float(np.median(ts))

    @jax.jit
    def chain_xla(dbg, row, col, h):
        gx = jax.grad(
            lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x))) * 1e-6
        )

        def body(i, x):
            return x + gx(x) / (1.0 + jnp.float32(i))

        return jax.lax.fori_loop(0, K, body, h)

    results = {}
    t_xla = timed(chain_xla, dbg, row, col, h)
    results["xla"] = dict(ms=round(t_xla * 1e3, 3), ges=round(e2 / t_xla / 1e9, 4))
    print(f"XLA engine: {t_xla*1e3:.3f} ms  {e2/t_xla/1e9:.3f} Ge/s", flush=True)

    for G in args.gs:
        pk = pack_band(dbg, G=G)

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

        t_pk = timed(chain_pk, pk, dbg, row, col, h2)
        results[f"packed_G{G}"] = dict(
            ms=round(t_pk * 1e3, 3), ges=round(e2 / t_pk / 1e9, 4),
            speedup=round(t_xla / t_pk, 3),
        )
        print(
            f"packed G={G}: {t_pk*1e3:.3f} ms  {e2/t_pk/1e9:.3f} Ge/s "
            f"({t_xla/t_pk:.2f}x)", flush=True,
        )

        if args.bf16:
            h2b = h2.astype(jnp.bfloat16)

            @jax.jit
            def chain_bf(pk, dbg, row, col, h2b):
                gp = jax.grad(
                    lambda x2: jnp.sum(
                        jnp.square(
                            spmm_band_packed(pk, dbg, row, col, x2).astype(
                                jnp.float32
                            )
                        )
                    ) * 1e-6
                )

                def body(i, x2):
                    return x2 + gp(x2) / jnp.bfloat16(1.0 + i)

                return jax.lax.fori_loop(0, K, body, h2b)

            t_bf = timed(chain_bf, pk, dbg, row, col, h2b)
            results[f"packed_bf16_G{G}"] = dict(
                ms=round(t_bf * 1e3, 3), ges=round(e2 / t_bf / 1e9, 4),
                speedup=round(t_xla / t_bf, 3),
            )
            print(
                f"packed bf16 G={G}: {t_bf*1e3:.3f} ms  {e2/t_bf/1e9:.3f} Ge/s "
                f"({t_xla/t_bf:.2f}x)", flush=True,
            )

        if args.diag:
            from mdcommunity_tpu.ops.band_pallas import _apply

            for diag in ("full", "noscale", "nodot", "hlin", "noh"):
                @jax.jit
                def chain_d(pk, dbg, row, col, h2, _d=diag):
                    def body(i, x2):
                        y = _apply(pk, dbg, row, col, x2, False, _d)
                        return x2 + y * 1e-6
                    return jax.lax.fori_loop(0, K, body, h2)

                t_d = timed(chain_d, pk, dbg, row, col, h2)
                results[f"diag_G{G}_{diag}"] = round(t_d * 1e3, 3)
                print(f"  fwd-only G={G} {diag}: {t_d*1e3:.3f} ms", flush=True)

    print(json.dumps(dict(workload=dict(n=n, e2=e2, D=D, S=args.S, B=args.B, K=K),
                          results=results)))


if __name__ == "__main__":
    main()
