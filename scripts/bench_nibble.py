"""Nibble-packed base (2 window columns per byte) on-chip validation + A/B.

1. Correctness: nibble kernel fwd+bwd vs the f32 XLA engine on the real
   Mosaic lowering (interpret-mode tests pass even when lowering is wrong).
2. Speed: K-slope timing of the fwd+bwd chain, nibble vs int8 base, at the
   headline bench workload (2^20 nodes / 2^23 edges / D=64 / S=256 B=128).

Prints one JSON line.
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

    from bench import ring_powerlaw_edges, sol_model, V5E_HBM_BYTES_PER_S
    from mdcommunity_tpu.ops.band_pallas import (
        pack_band, pack_rows, spmm_band_packed, unpack_rows,
    )
    from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales

    out = {"metric": "nibble_ab"}

    def dedupe(src, dst, n):
        """Simple-graph workload: the random generator accumulates duplicate
        (src, dst) pairs (band values > 7); the framework's actual graphs
        (GMM duplex, real multiplex) are simple graphs with 0/1 adjacency,
        which is the nibble mode's domain.  Dedupe for a fair A/B."""
        key = src.astype(np.int64) * n + dst.astype(np.int64)
        _, idx = np.unique(key, return_index=True)
        return src[idx], dst[idx]

    # --- correctness at a mirror-bearing shape on the real chip
    rng = np.random.default_rng(1)
    n_c, e_c = 1 << 18, 1 << 20
    src, dst = ring_powerlaw_edges(n_c, e_c, rng, scale=24.0)
    src, dst = dedupe(src, dst, n_c)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    dbg = build_dense_band(ssym, dsym, None, n_c, S=256, B=128, dtype=jnp.int8)
    pkn = pack_band(dbg, G=8, nibble=True)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    from mdcommunity_tpu.ops.dense_band import spmm_dense_band

    ref = spmm_dense_band(dbg, row, col, h, precise=True)
    got = unpack_rows(spmm_band_packed(pkn, dbg, row, col, pack_rows(h)))
    err = float(
        jnp.max(jnp.abs(got - ref)) / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-9)
    )
    gref = jax.grad(
        lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x, True)))
    )(h)
    gpk = jax.grad(
        lambda x2: jnp.sum(jnp.square(spmm_band_packed(pkn, dbg, row, col, x2)))
    )(pack_rows(h))
    gerr = float(
        jnp.max(jnp.abs(unpack_rows(gpk) - gref))
        / jnp.maximum(jnp.max(jnp.abs(gref)), 1e-9)
    )
    out["fwd_max_rel_err"] = round(err, 7)
    out["bwd_max_rel_err"] = round(gerr, 7)
    assert err < 5e-2 and gerr < 8e-2, (err, gerr)

    # --- K-slope A/B at the headline workload
    n, e, dim = 1 << 20, 1 << 22, 64
    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    src, dst = dedupe(src, dst, n)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    e2 = len(ssym)
    dbg = build_dense_band(ssym, dsym, None, n, S=256, B=128, dtype=jnp.int8)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h2 = pack_rows(
        jnp.asarray(rng.standard_normal((dbg.pad_n, dim)).astype(np.float32))
    ).astype(jnp.bfloat16)

    def slope(pk):
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

        med = []
        for K in (8, 40):
            ch = make_chain(K)
            float(jnp.sum(ch(pk, dbg, row, col, h2).astype(jnp.float32)))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(jnp.sum(ch(pk, dbg, row, col, h2).astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            med.append(float(np.median(ts)))
        return (med[1] - med[0]) / 32.0

    for tag, nib in (("int8", False), ("nibble", True)):
        pk = pack_band(dbg, G=8, nibble=nib)
        t_it = slope(pk)
        sol = sol_model(pk, dbg, dim, 2)
        glue = 5 * dbg.n_blocks * dbg.S * dim * 2
        bytes_iter = 2 * sol["bytes_pass"] + glue
        out[tag] = {
            "t_iter_ms": round(t_it * 1e3, 3),
            "edges_per_s": round(e2 / t_it, 1),
            "sol_fraction": round(
                bytes_iter / V5E_HBM_BYTES_PER_S / t_it, 3
            ),
            "base_frac": sol["base_frac"],
        }
    out["speedup"] = round(
        out["int8"]["t_iter_ms"] / out["nibble"]["t_iter_ms"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
