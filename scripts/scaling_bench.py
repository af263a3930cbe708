"""Edge-partitioned SpMM scaling-efficiency harness.

BASELINE.json's north star asks for >=80% edges/s scaling efficiency from
1 chip -> 1 host -> N hosts on 10^6+-node duplex graphs.  This script measures
edges/s of the gp-edge-partitioned aggregation (parallel/partition.py) at
mesh sizes 1, 2, 4, ... and reports efficiency vs the 1-device run.

On real TPU slices run it under a full mesh (after
`mdcommunity_tpu.parallel.mesh.init_distributed()` on every host); for
methodology validation anywhere, `--virtual 8` forces an 8-virtual-device CPU
mesh (the numbers then measure the collective plumbing, not TPU silicon).

Usage:
  python scripts/scaling_bench.py [--virtual 8] [--nodes 1048576] [--edges 4194304]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (methodology mode)")
    ap.add_argument("--nodes", type=int, default=1 << 17)
    ap.add_argument("--edges", type=int, default=1 << 21)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mdcommunity_tpu.parallel.mesh import make_mesh
    from mdcommunity_tpu.parallel.partition import shard_edges, spmm_edge_partitioned

    rng = np.random.default_rng(0)
    n, e, d = args.nodes, args.edges, args.dim
    src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    dst = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    w = jnp.asarray(rng.random(e, dtype=np.float32))
    h = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    n_dev = len(jax.devices())
    results = []
    base = None
    gp = 1
    while gp <= n_dev:
        mesh = make_mesh(dp=1, gp=gp, devices=jax.devices()[:gp])
        with mesh:
            s, dd, ww = shard_edges(mesh, src, dst, w)
            f = jax.jit(lambda s, dd, ww, h: jnp.sum(spmm_edge_partitioned(mesh, s, dd, ww, h)))
            float(f(s, dd, ww, h))  # compile
            t0 = time.perf_counter()
            acc = 0.0
            for i in range(args.iters):
                acc += float(f(s, dd, ww, h * (1.0 + 0.01 * i)))
            dt = (time.perf_counter() - t0) / args.iters
        eps = e / dt
        if base is None:
            base = eps
        eff = eps / (base * gp)
        results.append(dict(gp=gp, edges_per_s=round(eps, 1),
                            efficiency=round(eff, 4)))
        gp *= 2
    print(json.dumps(dict(
        metric="edge_partitioned_spmm_scaling",
        devices=n_dev,
        platform=jax.default_backend(),
        results=results,
    )))


if __name__ == "__main__":
    main()
