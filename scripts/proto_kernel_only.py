"""Isolate dense-band Pallas kernel cost: raw kernel vs +scales vs +overflow."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.ops import dense_band as db

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    K = int(sys.argv[5]) if len(sys.argv) > 5 else 32
    dtn = sys.argv[6] if len(sys.argv) > 6 else "int8"
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}.get(dtn, jnp.int8)
    n = 1 << ln
    nb = -(-n // S)
    W2 = S + 2 * B
    rng = np.random.default_rng(0)
    base = (rng.random((nb, S, W2)) < 0.008).astype(np.int8)
    e2 = int(base.sum())
    dbg = db.DenseBandGraph(
        base=jnp.asarray(base, dtype),
        overflow=db.build_sorted_coo(
            np.zeros(0, np.int32), np.zeros(0, np.int32), nb * S
        ),
        w_ov=jnp.zeros((0,), jnp.float32),
        n=n, S=S, B=B,
    )
    h0 = jnp.asarray(rng.standard_normal((nb * S, dim)).astype(np.float32))
    print(f"n={n} e2={e2} S={S} B={B} dtype={dtn}", flush=True)

    @jax.jit
    def nop(x):
        return x + 1.0

    float(nop(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(jnp.float32(0)))
    rtt = (time.perf_counter() - t0) / 5
    print(f"RTT ~ {rtt*1e3:.1f} ms", flush=True)

    def raw(dbg, h):
        return db._raw(dbg, h, False)

    row = jnp.ones((nb * S,), jnp.float32)

    def full(dbg, h):
        return db.spmm_dense_band(dbg, row, row, h)

    def fb(dbg, h):
        return jax.grad(lambda x: jnp.sum(jnp.square(full(dbg, x))))(h)

    for name, f in [("raw kernel", raw), ("full fwd  ", full), ("full f+b  ", fb)]:

        @jax.jit
        def chain(dbg, h, f=f):
            def body(i, x):
                return f(dbg, x) / (1.0 + jnp.float32(i))
            return jax.lax.fori_loop(0, K, body, h)

        float(jnp.sum(chain(dbg, h0)))
        t0 = time.perf_counter()
        float(jnp.sum(chain(dbg, h0)))
        T = time.perf_counter() - t0
        t_it = (T - rtt) / K
        print(f"{name}: {t_it*1e3:8.3f} ms/iter  {e2/t_it/1e6:9.1f} Medges/s",
              flush=True)


if __name__ == "__main__":
    main()
