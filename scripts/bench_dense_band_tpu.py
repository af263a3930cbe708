"""Latency-amortized TPU timing of ops/dense_band.spmm_dense_band.

Usage: python scripts/bench_dense_band_tpu.py [ln le dim S B K dtype]
"""
import sys
import time

import numpy as np


def banded_edges(n, e, rng, alpha=1.5, scale=8.0):
    src = rng.integers(0, n, e).astype(np.int64)
    off = (scale * (rng.pareto(alpha, e) + 1.0)).astype(np.int64)
    off = np.minimum(off, n - 1) * rng.choice(np.array([-1, 1]), e)
    dst = np.clip(src + off, 0, n - 1)
    return src, dst


def main():
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops.dense_band import (
        build_dense_band, live_scales, spmm_dense_band,
    )

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    le = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    B = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    K = int(sys.argv[6]) if len(sys.argv) > 6 else 32
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}.get(sys.argv[7] if len(sys.argv) > 7 else "int8", jnp.int8)
    n, e = 1 << ln, 1 << le
    rng = np.random.default_rng(0)
    src, dst = banded_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    e2 = len(ssym)

    t0 = time.perf_counter()
    dbg = build_dense_band(ssym, dsym, None, n, S=S, B=B, dtype=dtype)
    tb = time.perf_counter() - t0
    print(
        f"n={n} e2={e2} S={S} B={B} dtype={np.dtype(dtype).name} "
        f"base={dbg.nbytes_base/1e9:.2f}GB mirror={int(dbg.ccoo.d_src.shape[0])}"
        f" C={dbg.C} spill={int(dbg.spill.d_src.shape[0])}"
        f" build={tb:.1f}s",
        flush=True,
    )

    cov = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, cov, "sum")
    h0 = jnp.asarray(rng.standard_normal((dbg.pad_n, dim)).astype(np.float32))

    @jax.jit
    def nop(x):
        return x + 1.0

    float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"RTT ~ {rtt*1e3:.1f} ms", flush=True)

    def fwd1(dbg, row, col, h):
        return spmm_dense_band(dbg, row, col, h)

    def fb1(dbg, row, col, h):
        return jax.grad(lambda x: jnp.sum(jnp.square(fwd1(dbg, row, col, x))))(h)

    for name, f in [("fwd", fwd1), ("f+b", fb1)]:

        @jax.jit
        def chain(dbg, row, col, h, f=f):
            def body(i, x):
                return f(dbg, row, col, x) / (1.0 + jnp.float32(i))
            return jax.lax.fori_loop(0, K, body, h)

        r = chain(dbg, row, col, h0)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        float(jnp.sum(chain(dbg, row, col, h0)))
        T = time.perf_counter() - t0
        t_it = (T - rtt) / K
        print(
            f"{name}: {t_it*1e3:8.3f} ms/iter  {e2/t_it/1e6:9.1f} Medges/s"
            f"  (total {T*1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
