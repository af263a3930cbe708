"""Sweep dense-band geometry (S, B) on the bench.py workload.

The band engine is HBM-bound on the base reads: bytes/iter ~ nb*(S+C)*W2
(int8), so narrower windows raise edges/s as long as the edge population
stays in-band (out-of-band edges ride the mirror lanes, and too many of
those spills to the slow full-table COO).  This script measures the actual
tradeoff on the real chip.

Usage: python scripts/tune_dense_band.py [--n 20] [--e 22] [--dim 64]
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
    ap.add_argument("--n", type=int, default=20, help="log2 nodes")
    ap.add_argument("--e", type=int, default=22, help="log2 directed edges")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=32, help="chained iters per jit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import ring_powerlaw_edges
    from mdcommunity_tpu.ops.dense_band import (
        build_dense_band,
        live_scales,
        spmm_dense_band,
    )

    n, e, dim, K = 1 << args.n, 1 << args.e, args.dim, args.k
    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    e2 = len(ssym)

    covered_np = rng.random(n) < 0.1
    h_np = rng.standard_normal((n, dim)).astype(np.float32)

    nop = jax.jit(lambda x: x + 1.0)
    float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5

    results = []
    for S, B in [(512, 128), (512, 64), (256, 128), (256, 64), (256, 32),
                 (128, 64), (128, 32), (1024, 128)]:
        dbg = build_dense_band(ssym, dsym, None, n, S=S, B=B, dtype=jnp.int8)
        ov = int(dbg.ccoo.d_src.shape[0]) + int(dbg.spill.d_src.shape[0])
        covered = jnp.asarray(np.pad(covered_np, (0, dbg.pad_n - n)))
        row, col = live_scales(dbg, covered, "sum")
        h = jnp.asarray(
            np.pad(h_np, ((0, dbg.pad_n - n), (0, 0)))
        )

        # operands must be ARGUMENTS (closed-over arrays become compile-time
        # constants and blow up the relay's compile-request size limit)
        grad_step = jax.grad(
            lambda x, dbg, row, col: jnp.sum(
                jnp.square(spmm_dense_band(dbg, row, col, x))
            )
            * 1e-6
        )

        @jax.jit
        def chain(dbg, row, col, hh):
            def body(i, x):
                return x + grad_step(x, dbg, row, col) / (1.0 + jnp.float32(i))

            return jax.lax.fori_loop(0, K, body, hh)

        float(jnp.sum(chain(dbg, row, col, h)))  # compile + warm
        t0 = time.perf_counter()
        float(jnp.sum(chain(dbg, row, col, h)))
        t_iter = (time.perf_counter() - t0 - rtt) / K
        eps = e2 / t_iter
        mb = dbg.base.nbytes / 1e6
        row_r = dict(S=S, B=B, C=dbg.C, base_MB=round(mb, 1),
                     overflow_edges=ov, ms_per_iter=round(t_iter * 1e3, 3),
                     gedges_per_s=round(eps / 1e9, 3))
        results.append(row_r)
        print(json.dumps(row_r), flush=True)

    best = max(results, key=lambda r: r["gedges_per_s"])
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
