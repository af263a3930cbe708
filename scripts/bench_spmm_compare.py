"""Compare SpMM fwd+bwd implementations on the live chip at bench.py shapes.

Usage: python scripts/bench_spmm_compare.py [n_nodes_log2 n_edges_log2 dim]
"""
import sys
import time

import numpy as np


def timeit(step, args, iters=6):
    import jax
    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        outs.append(step(*args))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops.spmm_csr import build_sorted_coo, spmm_sorted
    from mdcommunity_tpu.ops.pallas_spmm import build_block_coo, spmm

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    le = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_nodes, n_edges = 1 << ln, 1 << le
    print(f"n={n_nodes} e={n_edges} d={dim} on {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    src_np = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst_np = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    h = jnp.asarray(rng.standard_normal((n_nodes, dim)).astype(np.float32))

    # --- sorted-COO segment-sum path
    coo = build_sorted_coo(src_np, dst_np, n_nodes)
    w = jnp.asarray(rng.random(n_edges, dtype=np.float32))

    def loss_sorted(h, w):
        out = spmm_sorted(coo, w, h)
        return jnp.sum(out * out)

    step = jax.jit(jax.value_and_grad(loss_sorted, argnums=(0, 1)))
    dt = timeit(step, (h, w))
    print(f"sorted-COO  fwd+bwd: {dt*1e3:8.2f} ms  {n_edges/dt/1e6:9.1f} Medges/s", flush=True)

    # --- Pallas blocked kernel (symmetric: add both orientations)
    for S, T in [(512, 1024), (512, 512), (1024, 1024), (256, 512)]:
        both_src = np.concatenate([src_np, dst_np])
        both_dst = np.concatenate([dst_np, src_np])
        bcoo, slot_src, slot_dst, slot_mask = build_block_coo(
            both_src, both_dst, n_nodes, S=S, T=T
        )
        fill = 2 * n_edges / bcoo.n_slots
        wsym = np.zeros(bcoo.n_slots, np.float32)
        wsym[slot_mask] = rng.random(slot_mask.sum(), dtype=np.float32)
        wb = jnp.asarray(wsym.reshape(bcoo.n_pairs, bcoo.T))
        hp = jnp.pad(h, ((0, bcoo.n_blocks * S - n_nodes), (0, 0)))

        def loss_blk(hp, wb):
            out = spmm(bcoo, wb, hp)
            return jnp.sum(out * out)

        stepb = jax.jit(jax.value_and_grad(loss_blk, argnums=(0, 1)))
        try:
            dt = timeit(stepb, (hp, wb))
        except Exception as ex:  # noqa: BLE001
            print(f"pallas S={S} T={T}: FAILED {type(ex).__name__}: {ex}", flush=True)
            continue
        # count real (directed, single-orientation) edges for comparability
        print(
            f"pallas S={S:4d} T={T:4d} fill={fill:.3f} pairs={bcoo.n_pairs}"
            f" fwd+bwd: {dt*1e3:8.2f} ms  {n_edges/dt/1e6:9.1f} Medges/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
