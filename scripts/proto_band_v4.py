"""Pick the fastest band matmul formulation on TPU.

Candidates (same math):
  a) XLA 3-term batched einsum, int8 base slices, bf16 h, no hw materialization
  b) pallas 3-input kernel with arbitrary dim semantics
  c) same as (a) at S=256/B=128 (tighter band, same edges)
"""
import time
from functools import partial

import numpy as np


def run(S, B, variants):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mdcommunity_tpu.ops.dense_band import build_dense_band

    rng = np.random.default_rng(0)
    n, e = 1 << 18, 1 << 20
    src = rng.integers(0, n, e).astype(np.int64)
    off = (8.0 * (rng.pareto(1.5, e) + 1.0)).astype(np.int64)
    off = np.minimum(off, n - 1) * rng.choice(np.array([-1, 1]), e)
    dst = np.clip(src + off, 0, n - 1)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    dbg = build_dense_band(ssym, dsym, None, n, S=S, B=B, dtype=jnp.int8)
    nb, W2 = dbg.n_blocks, dbg.W2
    D = 64
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, D)), jnp.bfloat16)
    e_in_band = len(ssym) - int(dbg.overflow.d_src.shape[0])
    K = 32

    bL = dbg.base[:, :, :B]
    bM = dbg.base[:, :, B : B + S]
    bR = dbg.base[:, :, B + S :]

    def xla3(bL, bM, bR, h):
        hb = jnp.pad(h.reshape(nb, S, D), ((1, 1), (0, 0), (0, 0)))
        f = jnp.bfloat16
        out = (
            jnp.einsum("bsk,bkd->bsd", bL.astype(f), hb[:-2, S - B :, :],
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bsk,bkd->bsd", bM.astype(f), hb[1:-1],
                         preferred_element_type=jnp.float32)
            + jnp.einsum("bsk,bkd->bsd", bR.astype(f), hb[2:, :B, :],
                         preferred_element_type=jnp.float32)
        )
        return out.reshape(nb * S, D)

    def kern(a_ref, hm1_ref, h0_ref, hp1_ref, out_ref):
        hwv = jnp.concatenate(
            [hm1_ref[S - B :, :], h0_ref[...], hp1_ref[:B, :]], axis=0
        ).astype(jnp.bfloat16)
        out_ref[...] = jnp.dot(a_ref[...].astype(jnp.bfloat16), hwv,
                               preferred_element_type=jnp.float32)

    def pallas3(base2d, h):
        hp = jnp.pad(h, ((S, S), (0, 0)))
        blk = lambda shp, im: pl.BlockSpec(shp, im, memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[blk((S, W2), lambda i: (i, 0)),
                      blk((S, D), lambda i: (i, 0)),
                      blk((S, D), lambda i: (i + 1, 0)),
                      blk((S, D), lambda i: (i + 2, 0))],
            out_specs=blk((S, D), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((nb * S, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(base2d, hp, hp, hp)

    def bench(name, f, *args):
        @jax.jit
        def chain(*args):
            def body(i, x):
                o = f(*args[:-1], x)
                return (o / (1.0 + jnp.float32(i))).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, K, body, args[-1])
        r = chain(*args); float(jnp.sum(r.astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(chain(*args).astype(jnp.float32)))
        T = time.perf_counter() - t0
        print(f"S={S} B={B} {name}: {(T/K)*1e3:8.3f} ms/iter "
              f"{e_in_band/(T/K)/1e9:.2f} Gedge/s-fwd "
              f"(base {dbg.base.nbytes/1e9:.2f}GB)", flush=True)

    if "xla3" in variants:
        bench("xla3 int8", xla3, bL, bM, bR, h)
    if "pallas" in variants:
        bench("pallas arb int8", pallas3, dbg.base.reshape(nb * S, W2), h)


if __name__ == "__main__":
    run(512, 256, ("xla3", "pallas"))
    run(256, 128, ("xla3",))
    run(256, 256, ("xla3",))
    run(128, 128, ("xla3",))
