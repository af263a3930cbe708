"""On-chip probe for the fused-SAGE epilogue precision fix (round-4 #1).

Round 3's committed demo artifact (results_tpu/chip_r03/large_demo_r03.jsonl)
showed the packed/fused engine at AUDC 0.1290 vs the XLA engine's 0.1087 on
the identical 18,222-node graph — the bf16 epilogue dots' ~1% Q rounding
flips greedy argmax picks over ~8k sequential removals.  This probe measures,
on the same demo graph generator:

  * max relative Q error of each packed configuration vs the XLA engine
  * greedy top-1 agreement across a sample of mid-dismantling states
  * fused-forward time per configuration (is the f32 epilogue really free?)

Prints one JSON line (committed as results_tpu/chip_r04/f32_epi_probe.json).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mdcommunity_tpu.graphs.banded import build_banded_duplex, pack_duplex
    from mdcommunity_tpu.models.net import banded_test_forward
    from mdcommunity_tpu.models.net_packed import banded_test_forward_packed
    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config
    from scripts.large_graph_demo import synth_duplex_edges

    n = int(os.environ.get("PROBE_N", "18222"))
    rng = np.random.default_rng(0)
    e0, e1 = synth_duplex_edges(n, 6, rng)
    banded, _, _ = build_banded_duplex(n, e0, e1, max_rank=n)
    pks = pack_duplex(banded)
    spill = [int(banded.dbg(l).spill.d_src.shape[0]) for l in range(2)]
    fusable = all(s == 0 for s in spill)

    agent = DQNAgent(Config(variant="unit_cost"), seed=0)
    ck = "models_tpu/unit_cost_full_r1/best_model.ckpt"
    if os.path.exists(ck):
        agent.load(ck)
    params = agent.params

    q_xla = jax.jit(
        lambda c: banded_test_forward(params, banded, c)
    )
    q_unf = jax.jit(
        lambda c: banded_test_forward_packed(params, banded, pks, c)
    )
    q_f32 = jax.jit(
        lambda c: banded_test_forward_packed(
            params, banded, pks, c, fuse_sage=True, f32_epi=True
        )
    )
    q_bf16 = jax.jit(
        lambda c: banded_test_forward_packed(
            params, banded, pks, c, fuse_sage=True, f32_epi=False
        )
    )

    # states: fresh + increasing random covered fractions (mid-dismantling)
    pad_n = banded.pad_n
    states = []
    for frac in (0.0, 0.1, 0.25, 0.45):
        cov = np.asarray(rng.random(pad_n) < frac)
        cov[n:] = True
        states.append(jnp.asarray(cov))

    def stats(qa, qb):
        fa = np.isfinite(qa) & np.isfinite(qb)
        rel = np.max(np.abs(qa[fa] - qb[fa]) / (np.abs(qb[fa]) + 1e-6))
        top1 = int(np.argmax(np.where(fa, qa, -np.inf))
                   == np.argmax(np.where(fa, qb, -np.inf)))
        # top-32 set overlap (the stepRatio batch regime)
        ta = set(np.argsort(-np.where(fa, qa, -np.inf))[:32])
        tb = set(np.argsort(-np.where(fa, qb, -np.inf))[:32])
        return rel, top1, len(ta & tb) / 32.0

    out = {"n": n, "spill": spill, "configs": {}}
    combos = [("unfused", q_unf)]
    if fusable:
        combos += [("fused_f32epi", q_f32), ("fused_bf16epi", q_bf16)]
    for name, fn in combos:
        rels, tops, ovls = [], [], []
        for cov in states:
            qa = np.asarray(fn(cov))
            qb = np.asarray(q_xla(cov))
            r, t1, ov = stats(qa, qb)
            rels.append(r)
            tops.append(t1)
            ovls.append(ov)
        out["configs"][name] = dict(
            q_max_rel_err=round(float(np.max(rels)), 6),
            top1_agree=f"{sum(tops)}/{len(tops)}",
            top32_overlap=round(float(np.mean(ovls)), 4),
        )

    # timing: K-slope per forward (bench methodology)
    def make_chain(fwd_kwargs):
        def mk(K):
            @jax.jit
            def chain(cov):
                def body(i, acc):
                    c = cov.at[i].set(True)
                    q = banded_test_forward_packed(
                        params, banded, pks, c, **fwd_kwargs
                    )
                    return acc + jnp.sum(jnp.where(jnp.isfinite(q), q, 0.0))
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))
            return chain
        return mk

    # sever-parity: replay the same random sever batches through BOTH
    # engines' sever paths, then compare Q — the demo loop's actual regime
    # (the round-3 AUDC gap appeared over ~8k sever-interleaved steps).
    from mdcommunity_tpu.graphs.banded import apply_severs, apply_severs_packed

    sev_xla = banded
    sev_pk_banded, sev_pks = banded, pks
    all_edges = [np.asarray(e) for e in (e0, e1)]
    # use ORDERED edges (banded ids): rebuild from dbg is complex; instead
    # resample from the host ordered arrays
    from mdcommunity_tpu.graphs.ordering import apply_order, rcm_order

    perm = rcm_order([e0[:, 0], e1[:, 0]], [e0[:, 1], e1[:, 1]], n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    for it in range(4):
        for layer in range(2):
            e = all_edges[layer]
            pick = rng.choice(len(e), 300, replace=False)
            s = inv[e[pick, 0]].astype(np.int32)
            d = inv[e[pick, 1]].astype(np.int32)
            k = 512
            sp = np.zeros(k, np.int32)
            dp = np.zeros(k, np.int32)
            vp = np.zeros(k, bool)
            sp[:300], dp[:300], vp[:300] = s, d, True
            sev_xla = apply_severs(
                sev_xla, layer, jnp.asarray(sp), jnp.asarray(dp), jnp.asarray(vp)
            )
            sev_pk_banded, sev_pks = apply_severs_packed(
                sev_pk_banded, sev_pks, layer, jnp.asarray(sp), jnp.asarray(dp),
                jnp.asarray(vp),
            )
    qx = np.asarray(jax.jit(
        lambda c: banded_test_forward(params, sev_xla, c))(states[1]))
    qp = np.asarray(jax.jit(
        lambda c: banded_test_forward_packed(
            params, sev_pk_banded, sev_pks, c))(states[1]))
    r, t1, ov = stats(qp, qx)
    out["after_severs"] = dict(
        q_max_rel_err=round(float(r), 6), top1_agree=t1,
        top32_overlap=round(float(ov), 4),
    )

    if jax.default_backend() in ("tpu", "axon") and fusable:
        for name, kw in (
            ("fused_f32epi", dict(fuse_sage=True, f32_epi=True)),
            ("fused_bf16epi", dict(fuse_sage=True, f32_epi=False)),
        ):
            mk = make_chain(kw)
            med = []
            for K in (4, 12):
                fn = mk(K)
                float(fn(states[1]))
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(fn(states[1]))
                    ts.append(time.perf_counter() - t0)
                med.append(float(np.median(ts)))
            out["configs"][name]["fwd_ms"] = round((med[1] - med[0]) / 8 * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
