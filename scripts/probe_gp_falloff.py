"""Attribute the virtual-mesh gp throughput falloff (round-4 weak point 3).

SCALING_r04 shows band-engine CPU-mesh retention 1.0 -> 1.44 -> 1.39 ->
1.13 at gp=1/2/4/8 while the analytic collective volume is only 6.5% of
local bytes.  This probe brackets each gp point with surgical variants of
the SAME fwd+bwd workload:

  full      — production spmm_band_sharded (halo ppermutes + mirror
              all_gather + local contractions)
  nohalo    — ppermute replaced by an identity passthrough at trace time
              (same math shapes, zero halo collectives)
  nomirror  — empty overflow table (n_mirror=0 skips the mirror
              all_gather + segment-sum + mirror einsum entirely)
  local     — both removed: pure local contractions under shard_map

t_full - t_nohalo isolates the halo collectives, t_full - t_nomirror the
mirror chain, t_local vs t_full the total collective+overhead share.  A
falloff that persists in `local` is host scheduling (8 shard programs
time-sharing 2 cores), not communication — and would not transfer to real
ICI; a gap concentrated in the mirror chain would be structural.

Usage: python scripts/probe_gp_falloff.py [--virtual 8]  (one JSON line)
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=8)
    ap.add_argument("--nodes", type=int, default=1 << 17)
    ap.add_argument("--edges", type=int, default=1 << 21)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
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

    import mdcommunity_tpu.parallel.band_partition as bp
    from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales
    from mdcommunity_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    n, e, d = args.nodes, args.edges, args.dim
    usrc = rng.integers(0, n, e // 2).astype(np.int64)
    off = (8.0 * (rng.pareto(2.5, e // 2) + 1.0)).astype(np.int64)
    off = np.minimum(off, n // 2 - 1) * rng.choice(np.array([-1, 1]), e // 2)
    udst = (usrc + off) % n
    keep = usrc != udst
    usrc, udst = usrc[keep], udst[keep]
    src_np = np.concatenate([usrc, udst])
    dst_np = np.concatenate([udst, usrc])
    e_real = len(src_np)
    h0 = rng.standard_normal((n, d)).astype(np.float32)
    covered = rng.random(n) < 0.1

    dbg = build_dense_band(src_np, dst_np, None, n, S=256, B=128,
                           max_mirror=256)
    assert dbg.spill.d_src.shape[0] == 0
    # nomirror variant: empty overflow table => n_mirror=0, the mirror
    # all_gather / segment-sum / mirror einsum all drop out
    dbg_nm = dataclasses.replace(
        dbg,
        ccoo=dataclasses.replace(
            dbg.ccoo,
            d_src=dbg.ccoo.d_src[:0], d_dst=dbg.ccoo.d_dst[:0],
        ),
        w_cov=dbg.w_cov[:0],
    )

    real_ppermute = jax.lax.ppermute

    def fake_ppermute(x, axis_name, perm):  # identity: zero collectives
        return x

    def time_variant(mesh, graph, nohalo):
        bp._build.cache_clear()  # the lru key doesn't see the monkeypatch
        row, col = live_scales(dbg, jnp.asarray(covered), "sum")
        row_s, col_s, h_s = bp.shard_band_vectors(
            mesh, row, col, jnp.asarray(h0)
        )
        dbg_s = bp.shard_band_graph(mesh, graph)

        def loss(hh, g_):
            y = bp.spmm_band_sharded(mesh, g_, row_s, col_s, hh)
            return jnp.sum(y * y)

        f = jax.jit(jax.value_and_grad(loss))
        jax.lax.ppermute = fake_ppermute if nohalo else real_ppermute
        try:
            v, g = f(h_s, dbg_s)
            jax.block_until_ready(g)
            best = float("inf")
            for _rep in range(args.reps):  # best-of-reps: min is robust to
                t0 = time.perf_counter()   # host-scheduling outliers on the
                for _ in range(args.iters):  # oversubscribed 2-core box
                    v, g = f(h_s, dbg_s)
                    float(v)
                best = min(best,
                           (time.perf_counter() - t0) / args.iters)
        finally:
            jax.lax.ppermute = real_ppermute
        bp._build.cache_clear()
        return best

    n_dev = len(jax.devices())
    rows = []
    gp = 1
    while gp <= n_dev:
        mesh = make_mesh(dp=1, gp=gp, devices=jax.devices()[:gp])
        with mesh:
            t_full = time_variant(mesh, dbg, nohalo=False)
            t_nohalo = time_variant(mesh, dbg, nohalo=True)
            t_nomirror = time_variant(mesh, dbg_nm, nohalo=False)
            t_local = time_variant(mesh, dbg_nm, nohalo=True)
        rows.append({
            "gp": gp,
            "t_full_ms": round(1e3 * t_full, 2),
            "t_nohalo_ms": round(1e3 * t_nohalo, 2),
            "t_nomirror_ms": round(1e3 * t_nomirror, 2),
            "t_local_ms": round(1e3 * t_local, 2),
            "halo_cost_ms": round(1e3 * (t_full - t_nohalo), 2),
            "mirror_cost_ms": round(1e3 * (t_full - t_nomirror), 2),
            "collective_share": round(1.0 - t_local / t_full, 4),
            "edges_per_s_full": round(e_real / t_full, 1),
            "retention_local_vs_gp1": None,  # filled below
        })
        gp *= 2
    base_full = rows[0]["t_full_ms"]
    base_local = rows[0]["t_local_ms"]
    for r in rows:
        r["retention_full_vs_gp1"] = round(base_full / r["t_full_ms"], 4)
        r["retention_local_vs_gp1"] = round(base_local / r["t_local_ms"], 4)

    out = {
        "probe": "gp_falloff_attribution",
        "platform": jax.default_backend(),
        "devices": n_dev, "nodes": n, "edges": e_real, "dim": d,
        "rows": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
