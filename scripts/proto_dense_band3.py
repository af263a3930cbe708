"""Latency-amortized timing: K chained SpMM iterations inside one jit, one
host sync.  t_iter = (T_total - RTT) / K with RTT measured on a no-op."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    le = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    B = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    K = int(sys.argv[6]) if len(sys.argv) > 6 else 32
    n = 1 << ln
    W2 = S + 2 * B
    nb = -(-n // S)
    pad_n = nb * S
    e2 = 1 << (le + 1)
    rng = np.random.default_rng(0)
    print(f"n={n} S={S} B={B} W2={W2} nb={nb} K={K}", flush=True)

    dens = (rng.random((nb, S, W2)) < (e2 / (nb * S * W2))).astype(np.float32)
    h0 = jnp.asarray(rng.standard_normal((pad_n, dim)).astype(np.float32))
    cov = jnp.asarray(rng.random(pad_n) < 0.1)

    # RTT measurement: trivial jit
    @jax.jit
    def nop(x):
        return x + 1.0

    s = jnp.float32(0.0)
    float(nop(s))
    t0 = time.perf_counter()
    for _ in range(5):
        float(nop(s))
    rtt = (time.perf_counter() - t0) / 5
    print(f"RTT ~ {rtt*1e3:.1f} ms", flush=True)

    def window_cols(vec, dtype):
        vp = jnp.pad(vec, (B, B + S))
        idx = jnp.arange(W2)[None, :] + S * jnp.arange(nb)[:, None]
        return vp[idx].astype(dtype)

    def windows3(h, dtype):
        hb = h.reshape(nb, S, dim).astype(dtype)
        prev = jnp.pad(hb[:, S - B :, :], ((1, 0), (0, 0), (0, 0)))[:-1]
        nxt = jnp.pad(hb[:, :B, :], ((0, 1), (0, 0), (0, 0)))[1:]
        return jnp.concatenate([prev, hb, nxt], axis=1)

    for dt_name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        base = jnp.asarray(dens, dtype)

        def fwd1(base, h, cov):
            row = (~cov).astype(dtype).reshape(nb, S)
            col = window_cols(~cov, dtype)
            a = base * row[:, :, None] * col[:, None, :]
            hw = windows3(h, dtype)
            o = jnp.einsum("bsw,bwd->bsd", a, hw, preferred_element_type=jnp.float32)
            return o.reshape(pad_n, dim)

        def fb1(base, h, cov):
            def loss(h):
                return jnp.sum(jnp.square(fwd1(base, h, cov)))
            return jax.grad(loss)(h)

        for name, f in [("fwd ", fwd1), ("f+b ", fb1)]:

            @jax.jit
            def chain(base, h, cov, f=f):
                def body(i, h):
                    o = f(base, h, cov)
                    return o / (1.0 + jnp.float32(i))  # keep magnitudes sane
                return jax.lax.fori_loop(0, K, body, h)

            r = chain(base, h0, cov)
            float(jnp.sum(r))  # compile+warm
            t0 = time.perf_counter()
            r = chain(base, h0, cov)
            float(jnp.sum(r))
            T = time.perf_counter() - t0
            t_it = (T - rtt) / K
            print(
                f"{dt_name} {name}: {t_it*1e3:8.3f} ms/iter  "
                f"{e2/t_it/1e6:9.1f} Medges/s   (total {T*1e3:.1f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
