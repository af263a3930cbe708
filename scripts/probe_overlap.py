"""Compute/DMA overlap control experiment (r04): adding scale-extraction-
shaped VPU work (masked lane reductions) to a saturated minimal stream adds
its FULL cost (811 -> 567 GB/s on v5e) — VMEM-port-heavy VPU work does not
hide behind DMA at saturation.  This is why the band kernel's components
are additive and why the r04 hoisting fix pays.  Cited in RESULTS.md.
"""

import numpy as np, sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
nb, rows, width, G = 4096, 256, 512, 8
Sh = 128
x = jnp.asarray(rng.integers(0, 3, (nb, rows, width)), jnp.int8)

def make(extra_compute):
    def kernel(x_ref, s_ref, o_ref):
        total = jnp.zeros((8,128), jnp.float32)
        for g in range(G):
            blk = x_ref[g].astype(jnp.float32)  # [rows, width]
            acc = jnp.sum(blk)
            if extra_compute:
                # mimic the scale extraction: masked lane reductions +
                # broadcasts, ~the same VPU shape as cols()
                Wh = 256
                ii = jax.lax.broadcasted_iota(jnp.int32, (Wh,128), 0)
                kk = jax.lax.broadcasted_iota(jnp.int32, (Wh,128), 1)
                me = kk == 2*jax.lax.rem(ii,64)
                mo = kk == 2*jax.lax.rem(ii,64)+1
                t = blk[:Wh, :128]
                z = jnp.zeros_like(t)
                ce = jnp.sum(jnp.where(me, t, z), axis=1, keepdims=True)
                co = jnp.sum(jnp.where(mo, t, z), axis=1, keepdims=True)
                acc = acc + jnp.sum(ce) + jnp.sum(co)
            total = total + acc
        o_ref[...] = total + s_ref[...]
    return pl.pallas_call(
        kernel,
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((G, rows, width), lambda p: (p, 0, 0)),
            pl.BlockSpec((8, 128), lambda p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda p: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )

for extra, label in ((False, "reduce_only"), (True, "reduce+scalework")):
    f = make(extra)
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
