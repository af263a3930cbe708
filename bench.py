"""Benchmark: sparse neighborhood-aggregation (SpMM) forward+backward edges/s/chip.

This is BASELINE.json's north-star metric — the reference's hot kernel is
torch_sparse.spmm on CUDA (MultiDismantler_net_graphsage.py:139-377, loss
MultiDismantler_torch.py:420); ours is the packed Pallas band kernel
(mdcommunity_tpu/ops/band_pallas.py: lane-packed node pairs, single-DMA
double-buffered h windows, in-kernel rank-1 liveness scales and mirror
expansion) over block-band adjacency storage (ops/dense_band.py), with bf16
activation storage and f32 accumulation — the production TPU configuration
(exact-parity tested against the f32 XLA engine in tests/test_band_pallas.py;
the measured engine A/B lives in scripts/tune_band_packed.py).

Workload: a 2^20-node layer of a locality-ordered duplex graph — circular
power-law offsets with tail exponent 2.5, matching the GMM generator's
connection kernel P(d) ~ d^(-1/T), T=0.4 (GMM.py:6-68 / Hyperbolic.py:101-117)
after angular ordering — 2^23 directed (symmetrized) edges, 64-dim features
(the model family's embedding width), 10% of nodes removed (mid-dismantling
liveness mask).  Timed: value_and_grad of a scalar loss through the SpMM,
i.e. forward + backward, K iterations chained inside one jit (a host sync via
float() is the only reliable fence on this backend), median of 5 runs.

vs_baseline: the reference publishes no edges/s number (it is a single-GPU
Python capsule); the denominator 6.0e8 edges/s is a documented estimate of
torch_sparse.spmm fwd+bwd throughput on the reference's V100 at D=64 fp32
(~900 GB/s HBM / ~1.5 KB moved per edge over fwd+bwd).  Values > 1 beat it.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def ring_powerlaw_edges(n, e, rng, alpha=2.5, scale=8.0):
    """Directed edges with circular power-law offsets (locality-ordered
    geometric graph surrogate; alpha matches GMM's T=0.4 tail)."""
    src = rng.integers(0, n, e).astype(np.int64)
    off = (scale * (rng.pareto(alpha, e) + 1.0)).astype(np.int64)
    off = np.minimum(off, n // 2 - 1) * rng.choice(np.array([-1, 1]), e)
    dst = (src + off) % n
    return src, dst


def main():
    # Watchdog: the axon tunnel can wedge such that the first device op
    # blocks forever (claim wait has no timeout).  A normal full run takes
    # ~2-3 min including compile; if we are still stuck at 12 min, emit the
    # one required JSON line with an error marker instead of hanging the
    # driver.
    import signal

    def _bail(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "spmm_fwdbwd_edges_per_s_per_chip",
                    "value": 0.0,
                    "unit": "edges/s",
                    "vs_baseline": 0.0,
                    "error": "tpu unreachable (watchdog fired)",
                }
            ),
            flush=True,
        )
        raise SystemExit(0)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(720)

    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops.band_pallas import (
        pack_band,
        pack_rows,
        spmm_band_packed,
    )
    from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales

    n, e, dim = 1 << 20, 1 << 22, 64
    S, B, G = 256, 128, 8
    baseline_edges_per_s = 6.0e8
    K = 32

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

    @jax.jit
    def chain(pk, dbg, row, col, h2):
        grad_step = jax.grad(
            lambda x2: jnp.sum(
                jnp.square(
                    spmm_band_packed(pk, dbg, row, col, x2).astype(jnp.float32)
                )
            )
            * 1e-6
        )

        def body(i, x2):
            return x2 + grad_step(x2) / jnp.bfloat16(1.0 + i)

        return jax.lax.fori_loop(0, K, body, h2)

    # compile + warm (result sync via host transfer; block_until_ready does
    # not fence execution on the tunnel backend)
    float(jnp.sum(chain(pk, dbg, row, col, h2).astype(jnp.float32)))

    nop = jax.jit(lambda x: x + 1.0)
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5

    from mdcommunity_tpu.utils.profiling import ThroughputMeter

    meter = ThroughputMeter("edges")
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(chain(pk, dbg, row, col, h2).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0 - rtt)
    meter.add(e2 * K, float(np.median(ts)))

    signal.alarm(0)
    edges_per_s = meter.rate
    print(
        json.dumps(
            {
                "metric": "spmm_fwdbwd_edges_per_s_per_chip",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / baseline_edges_per_s, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
