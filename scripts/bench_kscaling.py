"""K-scaling diagnosis of the headline bench methodology.

bench.py times a K=32-iteration fwd+bwd chain and subtracts a separately
measured nop round-trip.  The r03 SoL accounting showed that methodology
reporting 2.8x the physical HBM peak — the subtraction over-corrects (the
fixed per-call overhead of a large execute request is not the nop RTT).

This script times the SAME chain at several K and fits time = a + b*K:
the slope b is the true per-iteration (fwd+bwd) time, free of any per-call
overhead assumption; the intercept a is the real overhead (compare with the
nop RTT).  Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import ring_powerlaw_edges, sol_model, V5E_HBM_BYTES_PER_S, V5E_BF16_FLOPS
    from mdcommunity_tpu.ops.band_pallas import (
        pack_band, pack_rows, spmm_band_packed,
    )
    from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales

    n, e, dim = 1 << 20, 1 << 22, 64
    S, B, G = 256, 128, 8
    Ks = [8, 32, 96]

    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    e2 = len(ssym)
    dbg = build_dense_band(ssym, dsym, None, n, S=S, B=B, dtype=jnp.int8)
    pk = pack_band(dbg, G=G)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h2 = pack_rows(
        jnp.asarray(rng.standard_normal((dbg.pad_n, dim)).astype(np.float32))
    ).astype(jnp.bfloat16)

    def make_chain(K):
        @jax.jit
        def chain(pk, dbg, row, col, h2):
            grad_step = jax.grad(
                lambda x2: jnp.sum(
                    jnp.square(
                        spmm_band_packed(pk, dbg, row, col, x2).astype(
                            jnp.float32
                        )
                    )
                )
                * 1e-6
            )

            def body(i, x2):
                return x2 + grad_step(x2) / jnp.bfloat16(1.0 + i)

            return jax.lax.fori_loop(0, K, body, h2)

        return chain

    nop = jax.jit(lambda x: x + 1.0)
    for _ in range(3):
        float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5

    raw = {}
    for K in Ks:
        chain = make_chain(K)
        float(jnp.sum(chain(pk, dbg, row, col, h2).astype(jnp.float32)))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(chain(pk, dbg, row, col, h2).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        raw[K] = float(np.median(ts))

    ks = np.array(Ks, float)
    ys = np.array([raw[K] for K in Ks])
    b_slope, a_icpt = np.polyfit(ks, ys, 1)

    sol = sol_model(pk, dbg, dim, 2)
    glue = 5 * dbg.n_blocks * dbg.S * dim * 2
    bytes_iter = 2 * sol["bytes_pass"] + glue
    t_hbm = bytes_iter / V5E_HBM_BYTES_PER_S
    t_mxu = 2 * sol["flops_pass"] / V5E_BF16_FLOPS

    print(json.dumps({
        "metric": "bench_kscaling",
        "raw_s": {str(k): round(v, 5) for k, v in raw.items()},
        "slope_per_iter_ms": round(b_slope * 1e3, 4),
        "intercept_ms": round(a_icpt * 1e3, 2),
        "nop_rtt_ms": round(rtt * 1e3, 2),
        "edges_per_s_slope": round(e2 / b_slope, 1),
        "sol_t_iter_ms": round(max(t_hbm, t_mxu) * 1e3, 4),
        "sol_fraction_slope": round(max(t_hbm, t_mxu) / b_slope, 3),
    }))


if __name__ == "__main__":
    main()
