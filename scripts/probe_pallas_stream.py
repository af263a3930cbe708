"""Minimal Pallas stream-rate probe (r04 speed-of-light attribution):
measures the practical HBM rate a bare BlockSpec-pipelined kernel achieves
for the packed base's shape/dtype — the honest roof for the band kernel's
streams.  Measured on v5e: 603-757 GB/s (vs 819 datasheet).  Cited in
RESULTS.md "Speed-of-light attribution".
"""

import numpy as np, sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make_stream(nb, rows, width, G):
    def kernel(x_ref, s_ref, o_ref):
        acc = jnp.sum(x_ref[...].astype(jnp.float32))
        o_ref[...] = acc + s_ref[...]
    grid = (nb // G,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, rows, width), lambda p: (p, 0, 0)),
            pl.BlockSpec((8, 128), lambda p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )

def kslope(mk, args, Ks=(8,40)):
    med=[]
    for K in Ks:
        f=mk(K); float(f(*args))
        ts=[]
        for _ in range(5):
            t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
        med.append(np.median(ts))
    return (med[1]-med[0])/(Ks[1]-Ks[0])

rng = np.random.default_rng(0)
for (nb, rows, width, G, label) in (
    (4096, 256, 512, 8, "int8_base_shape_G8"),
    (4096, 256, 512, 32, "int8_base_G32"),
    (512, 2048, 512, 4, "int8_hugeblocks"),
):
    x = jnp.asarray(rng.integers(0, 3, (nb, rows, width)), jnp.int8)
    f = make_stream(nb, rows, width, G)
    def mk(K):
        @jax.jit
        def chain(xx):
            def body(i, acc):
                s = jnp.full((8,128), acc, jnp.float32)
                return acc + jnp.sum(f(xx, s)[:1,:1])
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return chain
    t = kslope(mk, (x,))
    print(json.dumps(dict(label=label, ms=round(t*1e3,3), gbps=round(x.nbytes/t/1e9,1))), flush=True)
