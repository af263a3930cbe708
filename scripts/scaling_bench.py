"""Edge-partitioned SpMM scaling-efficiency harness.

BASELINE.json's north star asks for >=80% edges/s scaling efficiency from
1 chip -> 1 host -> N hosts on 10^6+-node duplex graphs.  This script measures
fwd+bwd edges/s of BOTH gp-partitioned aggregation engines at mesh sizes
1, 2, 4, ... and reports efficiency vs the 1-device run:

  band  — halo-exchange block-banded engine (parallel/band_partition.py):
          collective volume O(B*D) per chip, independent of N (the scalable
          design; this is the headline number)
  coo   — full-output-psum COO baseline (parallel/partition.py)

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

    from mdcommunity_tpu.ops.band_pallas import pack_band, pack_rows
    from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales
    from mdcommunity_tpu.parallel.band_partition import (
        shard_band_graph, shard_band_vectors, shard_packed_band,
        spmm_band_packed_sharded, spmm_band_sharded,
    )

    rng = np.random.default_rng(0)
    n, e, d = args.nodes, args.edges, args.dim
    # locality-ordered surrogate: circular power-law offsets (same workload
    # family as bench.py)
    usrc = rng.integers(0, n, e // 2).astype(np.int64)
    off = (8.0 * (rng.pareto(2.5, e // 2) + 1.0)).astype(np.int64)
    off = np.minimum(off, n // 2 - 1) * rng.choice(np.array([-1, 1]), e // 2)
    udst = (usrc + off) % n
    keep = usrc != udst
    usrc, udst = usrc[keep], udst[keep]
    src_np = np.concatenate([usrc, udst])
    dst_np = np.concatenate([udst, usrc])
    e_real = len(src_np)
    src = jnp.asarray(src_np.astype(np.int32))
    dst = jnp.asarray(dst_np.astype(np.int32))
    w = jnp.asarray(rng.random(e_real).astype(np.float32))
    h0 = rng.standard_normal((n, d)).astype(np.float32)
    covered = rng.random(n) < 0.1

    dbg = build_dense_band(src_np, dst_np, None, n, S=256, B=128, max_mirror=256)
    assert dbg.spill.d_src.shape[0] == 0

    n_dev = len(jax.devices())
    out = dict(metric="edge_partitioned_spmm_scaling", devices=n_dev,
               platform=jax.default_backend(), edges=e_real, nodes=n)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    # the packed engine rides the Pallas kernel: real timing needs real TPU
    # silicon (interpret mode would measure the interpreter, not the design)
    engines = ("band", "packed", "coo") if on_tpu else ("band", "coo")
    pk = pack_band(dbg) if on_tpu else None
    for engine in engines:
        results = []
        base = None
        gp = 1
        while gp <= n_dev:
            mesh = make_mesh(dp=1, gp=gp, devices=jax.devices()[:gp])
            with mesh:
                if engine == "band":
                    dbg_s = shard_band_graph(mesh, dbg)
                    row, col = live_scales(dbg, jnp.asarray(covered), "sum")
                    row_s, col_s, h_s = shard_band_vectors(
                        mesh, row, col, jnp.asarray(h0)
                    )

                    def loss(hh):
                        y = spmm_band_sharded(mesh, dbg_s, row_s, col_s, hh)
                        return jnp.sum(y * y)

                    f = jax.jit(jax.value_and_grad(loss))
                    args_t = (h_s,)
                elif engine == "packed":
                    pk_s = shard_packed_band(mesh, pk)
                    row, col = live_scales(dbg, jnp.asarray(covered), "sum")
                    row_s, col_s, h2_s = shard_band_vectors(
                        mesh, row, col, pack_rows(jnp.asarray(h0))
                    )

                    def loss(hh2):
                        y = spmm_band_packed_sharded(
                            mesh, pk_s, dbg, row_s, col_s, hh2
                        )
                        return jnp.sum(y.astype(jnp.float32) ** 2)

                    f = jax.jit(jax.value_and_grad(loss))
                    args_t = (h2_s,)
                else:
                    s_, dd_, ww_ = shard_edges(mesh, src, dst, w)

                    def loss(hh):
                        y = spmm_edge_partitioned(mesh, s_, dd_, ww_, hh)
                        return jnp.sum(y * y)

                    f = jax.jit(jax.value_and_grad(loss))
                    args_t = (jnp.asarray(h0),)
                v, g = f(*args_t)
                jax.block_until_ready(g)  # compile
                dt = float("inf")
                for _rep in range(3):  # best-of-3: min is robust to host-
                    t0 = time.perf_counter()  # scheduling outliers on the
                    for i in range(args.iters):  # oversubscribed CPU box
                        v, g = f(*args_t)
                        acc = float(v)
                    dt = min(dt, (time.perf_counter() - t0) / args.iters)
            eps = e_real / dt
            if base is None:
                base = eps
            eff = eps / (base * gp)
            results.append(dict(gp=gp, edges_per_s=round(eps, 1),
                                efficiency=round(eff, 4),
                                throughput_retention_vs_1dev=round(eps / base, 4)))
            gp *= 2
        out[engine] = results

    # Analytic per-pass communication/local-traffic ratio of the band engine
    # at gp shards: collective volume = 2 ppermutes of B rows (f32 D) + the
    # mirror all_gather; local traffic = the shard's slice of the int8 base +
    # h windows.  On real ICI this bounds the scaling-efficiency loss from
    # communication; when the measured virtual-CPU retention dips below it
    # (it does, esp. at gp=2), the dip is host-scheduling noise, not comms:
    # all virtual devices share one CPU, so a gp=1 run gives its single big
    # einsum the whole intra-op thread pool while gp=2 splits the same cores
    # across two shard programs plus synchronization — by gp=8 enough
    # parallel programs exist to re-saturate the cores (retention recovers,
    # 0.77 -> 0.98 in SCALING_r02).  The meaningful on-silicon signal is the
    # comm/local ratio below plus the measured single-chip edges/s.
    d_bytes = 4
    halo_bytes = 2 * 128 * args.dim * d_bytes
    mirror_bytes = dbg.n_blocks * dbg.C * args.dim * d_bytes
    local_bytes = (
        dbg.base.nbytes + dbg.pad_n * args.dim * d_bytes * 2
    )
    out["band_comm_analysis"] = dict(
        halo_bytes_per_shard=halo_bytes,
        mirror_allgather_bytes_total=mirror_bytes,
        local_bytes_1dev=local_bytes,
        comm_frac_at_gp8=round(
            (halo_bytes + mirror_bytes) / (local_bytes / 8), 6
        ),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
