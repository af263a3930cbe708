"""Attribute the packed kernel's speed-of-light gap (round-4 item: bench
runs at 473 of 819 GB/s while DMA-bound — where does the other 42% go?).

Measurements, all K-slope timed (see bench.py methodology):

  1. XLA stream ceiling: y = x * c over arrays of the bench run's total
     working-set size — the PRACTICAL copy bandwidth of this chip through
     XLA (the 819 GB/s datasheet number is not achievable by any real
     kernel; this measures what is).
  2. The packed kernel's diag='nodot' pass (DMA + scale extraction, no
     dots) vs the full pass at the bench workload — already known ~equal
     (tune.log), re-measured here for the record.
  3. A reduced-window variant: the same kernel with the h-window DMA as
     ONE contiguous piece (middle programs) vs the 3-piece wrap path — is
     DMA piece count a factor?  (Measured by comparing nb where all
     programs are middle programs vs the wrap-heavy small-nb case.)

Prints one JSON line (committed as results_tpu/chip_r04/hbm_roof.json).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kslope(fn, args, Ks=(8, 40)):
    """fn(K) -> jitted chain taking *args (operands MUST be arguments, not
    closure constants — the tunnel's compile request would embed them)."""
    med = []
    for K in Ks:
        f = fn(K)
        float(f(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        med.append(float(np.median(ts)))
    return (med[1] - med[0]) / (Ks[1] - Ks[0])


def main():
    import jax
    import jax.numpy as jnp

    from bench import ring_powerlaw_edges
    from mdcommunity_tpu.ops.band_pallas import pack_band, pack_rows, spmm_band_packed, _apply
    from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales

    out = {"metric": "hbm_roof_attribution"}

    # --- 1. XLA stream ceiling --------------------------------------------
    for name, mb in (("stream_256mb", 256), ("stream_1gb", 1024)):
        n_el = mb * 1024 * 1024 // 4
        x0 = jnp.ones((n_el,), jnp.float32)

        def mk(K):
            @jax.jit
            def chain(x):
                def body(i, acc):
                    return acc * 1.0000001

                return jnp.sum(jax.lax.fori_loop(0, K, body, x)[:8])

            return chain

        t = kslope(mk, (x0,))
        # one iteration reads + writes the full array
        out[name + "_gbps"] = round(2 * n_el * 4 / t / 1e9, 1)

    # --- 2. kernel full vs nodot at the bench workload --------------------
    lg = 20
    n, e = 1 << lg, 1 << (lg + 2)
    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    dbg = build_dense_band(
        np.concatenate([src, dst]), np.concatenate([dst, src]), None, n,
        S=256, B=128,
    )
    pk = pack_band(dbg)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h2 = pack_rows(
        jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    ).astype(jnp.bfloat16)

    def mk_kernel(diag):
        def mk(K):
            @jax.jit
            def chain(pkx, dbgx, rowx, colx, h2x):
                def body(i, acc):
                    o = _apply(pkx, dbgx, rowx, colx, acc, False, diag=diag)
                    return (o / jnp.float32(K)).astype(acc.dtype)

                return jnp.sum(
                    jax.lax.fori_loop(0, K, body, h2x).astype(jnp.float32)[:2, :2]
                )

            return chain

        return mk

    kargs = (pk, dbg, row, col, h2)
    t_full = kslope(mk_kernel("full"), kargs)
    t_nodot = kslope(mk_kernel("nodot"), kargs)
    t_noscale = kslope(mk_kernel("noscale"), kargs)
    base_bytes = pk.base_pk.nbytes
    h_bytes = h2.nbytes  # window reads ~= one full h pass + halos
    outb = h_bytes
    scale_bytes = 2 * dbg.pad_n * 4 * (pk.W2 // pk.S)  # pre-gathered windows
    bytes_pass = base_bytes + h_bytes + outb + scale_bytes
    out.update(
        kernel_full_ms=round(t_full * 1e3, 3),
        kernel_nodot_ms=round(t_nodot * 1e3, 3),
        kernel_noscale_ms=round(t_noscale * 1e3, 3),
        kernel_bytes_per_pass=int(bytes_pass),
        kernel_gbps_full=round(bytes_pass / t_full / 1e9, 1),
        base_frac=round(base_bytes / bytes_pass, 3),
    )

    # --- 3. pure base stream: same total bytes as the base, XLA reduce ----
    basef = pk.base_pk.reshape(-1).astype(jnp.int8)

    def mk_base(K):
        @jax.jit
        def chain(b):
            # full read-only reduce per iteration; the +i keeps the body
            # loop-VARIANT so XLA cannot hoist the stream out of the loop
            def body(i, acc):
                return acc + jnp.sum((b + i.astype(jnp.int8)).astype(jnp.int32))

            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        return chain

    t_base = kslope(mk_base, (basef,))
    out["base_readonly_gbps"] = round(basef.nbytes / t_base / 1e9, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
