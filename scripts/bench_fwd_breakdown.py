"""Attribute the model-level forward time (BENCH_MODEL_r03: XLA 26.4 ms vs
packed 38.9 ms at n=2^19) between aggregation kernels and model glue.

K-slope times, at the model workload's exact shapes (S=512, B=128, D=64):
  * one XLA band pass (bf16 dots, f32 storage)     x8 per forward
    (6 aggregations + 2 degree passes)
  * one packed-kernel pass (bf16 storage)          x6 per forward
    (degree passes still ride the XLA engine in _banded_inputs)

glue = model_fwd_total - (kernel passes) for each engine.  Prints one JSON
line; the committed result directs the round-4 optimization.
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

    from bench import ring_powerlaw_edges
    from mdcommunity_tpu.ops.band_pallas import (
        pack_band, pack_rows, spmm_band_packed,
    )
    from mdcommunity_tpu.ops.dense_band import (
        build_dense_band, live_scales, spmm_dense_band,
    )

    lg = 19
    n, e = 1 << lg, 1 << (lg + 2)
    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    pk = pack_band(dbg, G=8)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    h2b = pack_rows(h).astype(jnp.bfloat16)

    def mk_xla(K):
        @jax.jit
        def chain(dbg, row, col, h):
            def body(i, x):
                y = spmm_dense_band(dbg, row, col, x)
                return x + y * (1e-6 / (1.0 + i))  # vary input across iters

            return jax.lax.fori_loop(0, K, body, h)

        return chain

    def mk_pk(K):
        @jax.jit
        def chain(pk, dbg, row, col, h2):
            def body(i, x2):
                y2 = spmm_band_packed(pk, dbg, row, col, x2)
                return x2 + y2 * jnp.bfloat16(1e-6 / (1.0 + i))

            return jax.lax.fori_loop(0, K, body, h2)

        return chain

    def slope(make, *args):
        med = []
        for K in (8, 40):
            ch = make(K)
            float(jnp.sum(ch(*args).astype(jnp.float32)))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(jnp.sum(ch(*args).astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            med.append(float(np.median(ts)))
        return (med[1] - med[0]) / 32.0

    t_xla = slope(mk_xla, dbg, row, col, h)
    t_pk = slope(mk_pk, pk, dbg, row, col, h2b)

    # model-level totals come from the committed BENCH_MODEL artifact; if it
    # is absent the fallback constants are STALE r03 measurements — tag the
    # output so a mixed stale/live attribution is visible (ADVICE r3)
    model = {"model_fwd_ms": 26.39, "model_fwd_packed_ms": 38.95}
    model_source = "fallback_r03_constants"
    for cand in ("BENCH_MODEL_r04.json", "BENCH_MODEL_r03.json"):
        if os.path.exists(cand):
            model.update(json.load(open(cand)))
            model_source = cand
            break
    xla_total = model["model_fwd_ms"]
    pk_total = model["model_fwd_packed_ms"]
    out = {
        "metric": "fwd_breakdown",
        "model_source": model_source,
        "xla_pass_ms": round(t_xla * 1e3, 3),
        "packed_pass_ms": round(t_pk * 1e3, 3),
        "xla_model_ms": xla_total,
        "packed_model_ms": pk_total,
        # XLA forward: 6 aggregation + 2 degree passes on the XLA engine
        "xla_glue_ms": round(xla_total - 8 * t_xla * 1e3, 2),
        # packed forward: 6 packed aggregations + 2 XLA degree passes
        "packed_glue_ms": round(
            pk_total - 6 * t_pk * 1e3 - 2 * t_xla * 1e3, 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
