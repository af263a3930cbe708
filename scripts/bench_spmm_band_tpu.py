"""Banded SpMM fwd+bwd throughput on the live chip.

Usage: python scripts/bench_spmm_band_tpu.py [log2_nodes log2_edges dim S B]
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

    from mdcommunity_tpu.ops.band_spmm import band_weights, build_band, spmm_band

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    le = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    B = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    n, e = 1 << ln, 1 << le
    rng = np.random.default_rng(0)
    src, dst = banded_edges(n, e, rng)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    E2 = len(ssym)
    w = np.concatenate([rng.random(e, dtype=np.float32)] * 2)

    t0 = time.perf_counter()
    bg, slot_row, slot_col, in_band = build_band(ssym, dsym, n, S=S, B=B)
    wb = jnp.asarray(band_weights(bg, slot_row, slot_col, w[in_band]))
    order = np.argsort(dsym[~in_band], kind="stable")
    w_ov = jnp.asarray(w[~in_band][order])
    tb = time.perf_counter() - t0
    ovf = 1.0 - in_band.mean()
    print(
        f"n={n} e2={E2} d={dim} S={S} B={B} overflow={ovf:.4f}"
        f" build={tb:.1f}s on {jax.devices()}",
        flush=True,
    )

    h = jnp.asarray(rng.standard_normal((bg.pad_n, dim)).astype(np.float32))

    def loss(wb, w_ov, h):
        return jnp.sum(jnp.square(spmm_band(bg, wb, w_ov, h)))

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    out = step(wb, w_ov, h)
    jax.block_until_ready(out)
    iters = 8
    t0 = time.perf_counter()
    outs = [step(wb, w_ov, h) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"band fwd+bwd: {dt*1e3:8.2f} ms  {E2/dt/1e6:9.1f} Medges/s (sym-directed)",
        flush=True,
    )

    # forward only
    fwd = jax.jit(lambda wb, w_ov, h: spmm_band(bg, wb, w_ov, h))
    o = fwd(wb, w_ov, h)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [fwd(wb, w_ov, h) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"band fwd:     {dt*1e3:8.2f} ms  {E2/dt/1e6:9.1f} Medges/s", flush=True)


if __name__ == "__main__":
    main()
