"""On-chip validation of ops/dense_band.py: Pallas path vs numpy oracle.

Run from repo root with default platform (axon TPU).  Covers: random banded
graph, graph with empty blocks, overflow edges, int8/bf16/f32 bases, masked
scales, and the VJP.
"""
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops.dense_band import (
        build_dense_band, live_scales, spmm_dense_band,
    )

    assert jax.default_backend() != "cpu", jax.devices()
    rng = np.random.default_rng(3)

    def dense_ref(src, dst, n, live):
        a = np.zeros((n, n), np.float64)
        np.add.at(a, (dst, src), 1.0)
        return a * np.outer(live, live)

    cases = []
    # random banded + far edges
    src = rng.integers(0, 900, 4000)
    dst = np.clip(src + rng.integers(-60, 61, 4000), 0, 899)
    far_s, far_d = rng.integers(0, 900, 60), rng.integers(0, 900, 60)
    s = np.concatenate([src, far_s]); d = np.concatenate([dst, far_d])
    keep = s != d
    cases.append(("random+overflow", np.concatenate([s[keep], d[keep]]),
                  np.concatenate([d[keep], s[keep]]), 900))
    # empty destination blocks: all edges among first 100 nodes of n=1200
    s2 = rng.integers(0, 100, 500)
    d2 = np.clip(s2 + rng.integers(-30, 31, 500), 0, 99)
    keep = s2 != d2
    cases.append(("empty-blocks", np.concatenate([s2[keep], d2[keep]]),
                  np.concatenate([d2[keep], s2[keep]]), 1200))

    for dtype, precise in [(jnp.int8, False), (jnp.bfloat16, False),
                           (jnp.float32, True)]:
        for name, ssym, dsym, n in cases:
            dbg = build_dense_band(ssym, dsym, None, n, S=256, B=128, dtype=dtype)
            covered = np.zeros(dbg.pad_n, bool)
            covered[dbg.n:] = True
            covered[rng.choice(n, n // 10, replace=False)] = True
            row, col = live_scales(dbg, jnp.asarray(covered), "sum")
            h = rng.standard_normal((dbg.pad_n, 64)).astype(np.float32)
            gc = rng.standard_normal((dbg.pad_n, 64)).astype(np.float32)

            out = np.asarray(jax.jit(
                lambda r, c, x: spmm_dense_band(dbg, r, c, x, precise=precise)
            )(row, col, jnp.asarray(h)))
            live = (~covered).astype(np.float64)
            a_eff = dense_ref(ssym, dsym, dbg.pad_n, live)
            ref = a_eff @ h.astype(np.float64)
            tol = 5e-5 if precise else 3e-2
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
            assert err < tol, (name, np.dtype(dtype).name, err)

            dh = np.asarray(jax.jit(jax.grad(
                lambda x: jnp.vdot(
                    spmm_dense_band(dbg, row, col, x, precise=precise),
                    jnp.asarray(gc))
            ))(jnp.asarray(h)))
            ref_dh = a_eff.T @ gc.astype(np.float64)
            err = np.abs(dh - ref_dh).max() / max(np.abs(ref_dh).max(), 1e-9)
            assert err < tol, ("vjp", name, np.dtype(dtype).name, err)
            print(f"OK {name:16s} {np.dtype(dtype).name:8s} precise={precise}",
                  flush=True)
    print("dense_band on-chip validation PASSED")


if __name__ == "__main__":
    main()
