"""Measure blocked Pallas SpMM fwd+bwd on a representative ordered duplex graph.

The framework's canonical data layout is locality-ordered (angular order for
GMM synthetics, RCM for real networks — graphs/ordering.py), so the bench graph
is banded: edge offsets follow a Pareto (power-law) distribution, matching the
geometric-model locality that survives RCM ordering of real multiplex nets.

Usage: python scripts/bench_spmm_banded.py [log2_nodes log2_edges dim]
"""
import sys
import time

import numpy as np


def banded_edges(n, e, rng, alpha=1.3, scale=8.0):
    """Directed edges (src, dst) with power-law angular offsets (both signs)."""
    src = rng.integers(0, n, e).astype(np.int64)
    off = (scale * (rng.pareto(alpha, e) + 1.0)).astype(np.int64)
    off = np.minimum(off, n - 1) * rng.choice(np.array([-1, 1]), e)
    dst = (src + off) % n
    return src.astype(np.int32), dst.astype(np.int32)


def timeit(step, args, iters=6):
    import jax
    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops.pallas_spmm import build_block_coo, spmm
    from mdcommunity_tpu.ops.spmm_csr import build_sorted_coo, spmm_sorted

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    le = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n, e = 1 << ln, 1 << le
    rng = np.random.default_rng(0)
    src, dst = banded_edges(n, e, rng)
    print(f"n={n} e={e} d={dim} (directed; symmetric pairs added) on {jax.devices()}",
          flush=True)

    h = jnp.asarray(rng.standard_normal((n, dim)).astype(np.float32))

    both_src = np.concatenate([src, dst])
    both_dst = np.concatenate([dst, src])
    E2 = len(both_src)

    for S, T in [(512, 1024), (256, 512), (512, 512), (1024, 1024), (256, 1024)]:
        t0 = time.perf_counter()
        bcoo, slot_src, slot_dst, slot_mask = build_block_coo(
            both_src, both_dst, n, S=S, T=T
        )
        tb = time.perf_counter() - t0
        fill = E2 / bcoo.n_slots
        wsym = np.zeros(bcoo.n_slots, np.float32)
        wsym[slot_mask] = rng.random(int(slot_mask.sum()), dtype=np.float32)
        wb = jnp.asarray(wsym.reshape(bcoo.n_pairs, bcoo.T))
        hp = jnp.pad(h, ((0, bcoo.n_blocks * S - n), (0, 0)))

        def loss_blk(hp, wb):
            return jnp.sum(jnp.square(spmm(bcoo, wb, hp)))

        stepb = jax.jit(jax.value_and_grad(loss_blk, argnums=(0, 1)))
        try:
            dt = timeit(stepb, (hp, wb))
        except Exception as ex:  # noqa: BLE001
            print(f"pallas S={S} T={T}: FAILED {type(ex).__name__}: {ex}", flush=True)
            continue
        print(
            f"pallas S={S:4d} T={T:4d} fill={fill:.3f} pairs={bcoo.n_pairs:6d}"
            f" build={tb:5.1f}s fwd+bwd={dt*1e3:8.2f} ms"
            f"  {E2/dt/1e6:9.1f} Medges/s (sym-directed)",
            flush=True,
        )

    coo = build_sorted_coo(both_src, both_dst, n)
    w = jnp.asarray(rng.random(E2, dtype=np.float32))

    def loss_sorted(h, w):
        return jnp.sum(jnp.square(spmm_sorted(coo, w, h)))

    step = jax.jit(jax.value_and_grad(loss_sorted, argnums=(0, 1)))
    dt = timeit(step, (h, w))
    print(f"sorted-COO fwd+bwd: {dt*1e3:8.2f} ms  {E2/dt/1e6:9.1f} Medges/s",
          flush=True)


if __name__ == "__main__":
    main()
