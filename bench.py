"""Benchmark: sparse neighborhood-aggregation (SpMM) forward+backward edges/s/chip.

This is BASELINE.json's north-star metric — the reference's hot kernel is
torch_sparse.spmm on CUDA (net :139-377, loss :420); ours is the aggregation
path in mdcommunity_tpu/ops.  The benchmark builds a random duplex-scale COO
graph (2^20 nodes, 2^22 directed edges, 64-dim features — the embedding width
of the model family), and times value_and_grad of a scalar loss through the
SpMM, i.e. forward + both backward scatter/gathers.

vs_baseline: the reference publishes no edges/s number (it is a single-GPU
Python capsule); the denominator 6.0e8 edges/s is a documented estimate of
torch_sparse.spmm fwd+bwd throughput on the reference's V100 at D=64 fp32
(~900 GB/s HBM / ~1.5 KB moved per edge over fwd+bwd).  Values > 1 beat it.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops.spmm_csr import build_sorted_coo, spmm_sorted

    n_nodes = 1 << 18
    n_edges = 1 << 20
    dim = 64
    baseline_edges_per_s = 6.0e8

    rng = np.random.default_rng(0)
    src_np = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst_np = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    coo = build_sorted_coo(src_np, dst_np, n_nodes)
    w = jnp.asarray(rng.random(n_edges, dtype=np.float32))
    h = jnp.asarray(rng.standard_normal((n_nodes, dim)).astype(np.float32))

    def loss(h, w):
        out = spmm_sorted(coo, w, h)
        return jnp.sum(out * out)

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    # warmup / compile
    (l, grads) = step(h, w)
    jax.block_until_ready(grads)

    # vary the input each iteration: identical dispatches can be cached by the
    # remote-execution relay and report fantasy numbers
    iters = 6
    scales = [jnp.float32(1.0 + 0.01 * i) for i in range(iters)]
    t0 = time.perf_counter()
    outs = []
    for s in scales:
        l, grads = step(h * s, w)
        outs.append(l)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    edges_per_s = n_edges * iters / dt
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
