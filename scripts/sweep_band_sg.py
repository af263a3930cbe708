"""(S, G) operating-point sweep of the packed band kernel (r04): S=128
exposes the contraction dots (+2.3 ms), S=256 partially (+0.49 before the
hoisting fix), S=512 hides them at 1.33x base storage.  Cited in
RESULTS.md "Speed-of-light attribution".
"""

import numpy as np, sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from bench import ring_powerlaw_edges
from mdcommunity_tpu.ops.band_pallas import pack_band, pack_rows, _apply
from mdcommunity_tpu.ops.dense_band import build_dense_band, live_scales

n, e = 1<<20, 1<<22
rng = np.random.default_rng(0)
src, dst = ring_powerlaw_edges(n, e, rng)
ssym, dsym = np.concatenate([src,dst]), np.concatenate([dst,src])
e_dir = 2*e

def kslope(mk, args, Ks=(8,40)):
    med=[]
    for K in Ks:
        f=mk(K); float(f(*args))
        ts=[]
        for _ in range(5):
            t0=time.perf_counter(); float(f(*args)); ts.append(time.perf_counter()-t0)
        med.append(np.median(ts))
    return (med[1]-med[0])/(Ks[1]-Ks[0])

for S, G in ((128,8),(128,16),(256,8),(256,16),(512,8)):
    dbg = build_dense_band(ssym, dsym, None, n, S=S, B=128)
    pk = pack_band(dbg, G=G)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h2 = pack_rows(jnp.asarray(rng.standard_normal((dbg.pad_n,64)).astype(np.float32))).astype(jnp.bfloat16)
    def mk(diag):
        def m(K):
            @jax.jit
            def chain(pkx, dbgx, rowx, colx, h2x):
                def body(i, acc):
                    o = _apply(pkx, dbgx, rowx, colx, acc, False, diag=diag)
                    return (o / jnp.float32(K)).astype(acc.dtype)
                return jnp.sum(jax.lax.fori_loop(0,K,body,h2x).astype(jnp.float32)[:2,:2])
            return chain
        return m
    args = (pk, dbg, row, col, h2)
    tf = kslope(mk("full"), args)
    tn = kslope(mk("nodot"), args)
    mb = pk.base_pk.nbytes/1e6
    print(json.dumps(dict(S=S, G=G, W2=dbg.W2, base_mb=round(mb,1),
      full_ms=round(tf*1e3,3), nodot_ms=round(tn*1e3,3),
      edges_per_s_fwd=round(e_dir/tf/1e9,3))), flush=True)
