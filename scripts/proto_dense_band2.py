"""Sub-piece timing of the dense-band SpMM on the live chip, with forced
host-sync timing (the relay's block_until_ready does not synchronize)."""
import sys
import time

import numpy as np


def sync_time(fn, args_list):
    """Median wall time per call, forcing a host fetch of a scalar each call."""
    import jax
    import jax.numpy as jnp

    r = fn(*args_list[0])
    float(jnp.sum(r if not isinstance(r, tuple) else r[0]))
    ts = []
    for args in args_list:
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(r if not isinstance(r, tuple) else r[0]))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    ln = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    le = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    B = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    dtype = jnp.bfloat16 if (len(sys.argv) > 6 and sys.argv[6] == "bf16") else jnp.float32
    n, e = 1 << ln, 1 << le
    W2 = S + 2 * B
    nb = -(-n // S)
    pad_n = nb * S
    rng = np.random.default_rng(0)
    print(f"n={n} S={S} B={B} W2={W2} nb={nb} dtype={np.dtype(dtype).name}", flush=True)

    base = jnp.asarray(rng.random((nb, S, W2), np.float32) * (rng.random((nb, S, W2)) < 0.01), dtype)
    h = jnp.asarray(rng.standard_normal((pad_n, dim)).astype(np.float32))
    cov = jnp.asarray(rng.random(pad_n) < 0.1)
    iters = 8
    hs = [h * jnp.float32(1 + 0.01 * i) for i in range(iters)]
    covs = [cov for _ in range(iters)]

    def window_cols(vec):
        vp = jnp.pad(vec, (B, B + S))
        idx = jnp.arange(W2)[None, :] + S * jnp.arange(nb)[:, None]
        return vp[idx]

    # 1. mask multiply alone
    @jax.jit
    def mask_mul(base, cov):
        row = (~cov).astype(dtype).reshape(nb, S)
        col = window_cols((~cov).astype(dtype))
        return base * row[:, :, None] * col[:, None, :]

    dt = sync_time(mask_mul, [(base, c) for c in covs])
    print(f"mask-mul alone      : {dt*1e3:8.2f} ms", flush=True)

    # 2. window build alone (vmap dynamic_slice)
    @jax.jit
    def windows(h):
        hp = jnp.pad(h, ((B, B + S), (0, 0))).astype(dtype)
        return jax.vmap(lambda i: jax.lax.dynamic_slice(hp, (i * S, 0), (W2, dim)))(
            jnp.arange(nb)
        )

    dt = sync_time(windows, [(x,) for x in hs])
    print(f"window gather alone : {dt*1e3:8.2f} ms", flush=True)

    # 2b. window via 3 aligned blocks + concat
    @jax.jit
    def windows3(h):
        hb = h.reshape(nb, S, dim).astype(dtype)
        prev = jnp.pad(hb[:, S - B :, :], ((1, 0), (0, 0), (0, 0)))[:-1]
        nxt = jnp.pad(hb[:, :B, :], ((0, 1), (0, 0), (0, 0)))[1:]
        return jnp.concatenate([prev, hb, nxt], axis=1)

    dt = sync_time(windows3, [(x,) for x in hs])
    print(f"window concat alone : {dt*1e3:8.2f} ms", flush=True)

    # 3. einsum alone on premasked base
    aw = mask_mul(base, cov)
    hw = windows3(h)

    @jax.jit
    def mm(aw, hw):
        return jnp.einsum("bsw,bwd->bsd", aw, hw, preferred_element_type=jnp.float32)

    dt = sync_time(mm, [(aw, x) for x in [windows3(x) for x in hs]])
    print(f"einsum alone        : {dt*1e3:8.2f} ms", flush=True)

    # 4. full fused fwd
    @jax.jit
    def full(base, h, cov):
        return mm(mask_mul(base, cov), windows3(h)).reshape(pad_n, dim)

    dt = sync_time(full, [(base, x, cov) for x in hs])
    e2 = 1 << (le + 1)
    print(f"full fwd            : {dt*1e3:8.2f} ms  {e2/dt/1e6:9.1f} Medges/s",
          flush=True)

    # 5. fwd+bwd(dh)
    @jax.jit
    def fb(base, h, cov):
        def loss(h):
            return jnp.sum(jnp.square(full(base, h, cov)))
        return jax.grad(loss)(h)

    dt = sync_time(fb, [(base, x, cov) for x in hs])
    print(f"full fwd+bwd(dh)    : {dt*1e3:8.2f} ms  {e2/dt/1e6:9.1f} Medges/s",
          flush=True)


if __name__ == "__main__":
    main()
