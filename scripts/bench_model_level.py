"""Model-level throughput benchmarks (VERDICT r1 #7): where does the next
optimization target actually live — kernel, head, or host glue?

Two workloads, both chained inside one jit (host sync once per chain; the
tunnel RTT is subtracted):

  1. full banded_test_forward at N=2^20 / 2^23+2^23 directed edges (the
     large-graph eval path: 3 rounds x 2 layers of band SpMM + virtual-node
     pooling + fusion + bilinear head) -> model-level edges/s
  2. train_step at training shapes (batch 64, 30-50-node GMM graphs: batch
     assembly + train_forward + Laplacian loss + Adam) -> train iters/s

Prints one JSON line (committed as BENCH_MODEL_r{N}.json).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_slope(make_chain, Ks, *args):
    """Per-iteration time as the slope of median chain time across Ks —
    constant per-call tunnel effects cancel (see bench.py's methodology
    note; the single-K + RTT-subtraction form over-reported badly)."""
    med = []
    for K in Ks:
        fn = make_chain(K)
        float(fn(*args))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        med.append(float(np.median(ts)))
    return (med[-1] - med[0]) / (Ks[-1] - Ks[0])


def bench_banded_forward(Ks=(4, 12)):
    import jax
    import jax.numpy as jnp

    from bench import ring_powerlaw_edges
    from mdcommunity_tpu.graphs.banded import build_banded_duplex, pack_duplex
    from mdcommunity_tpu.models.net import banded_test_forward, init_params
    from mdcommunity_tpu.models.net_packed import banded_test_forward_packed

    # default 2^19 nodes: the 2^20 build + two full-forward chain compiles
    # overran the checklist's 580 s timeout on the tunnel
    lg = int(os.environ.get("MDC_BENCH_LOGN", "19"))
    n, e = 1 << lg, 1 << (lg + 2)
    rng = np.random.default_rng(0)
    src, dst = ring_powerlaw_edges(n, e, rng)
    e0 = np.stack([src, dst], 1)
    src2, dst2 = ring_powerlaw_edges(n, e, rng)
    e1 = np.stack([src2, dst2], 1)
    banded, _, _ = build_banded_duplex(n, e0, e1, S=512, B=128, reorder=False,
                                       max_rank=n)
    pks = pack_duplex(banded)
    e_dir = 2 * (len(e0) + len(e1))
    params = init_params(jax.random.PRNGKey(0))
    covered0 = jnp.asarray(rng.random(banded.pad_n) < 0.1)

    def make_chain(K):
        @jax.jit
        def chain(banded, covered):
            def body(i, acc):
                cov = covered.at[i].set(True)  # vary input: no CSE
                q = banded_test_forward(params, banded, cov)
                return acc + jnp.sum(jnp.where(jnp.isfinite(q), q, 0.0))

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        return chain

    def make_chain_pk(K):
        @jax.jit
        def chain_pk(banded, pks, covered):
            def body(i, acc):
                cov = covered.at[i].set(True)
                q = banded_test_forward_packed(
                    params, banded, pks, cov, act_dtype=jnp.bfloat16,
                    interpret=False,
                )
                return acc + jnp.sum(jnp.where(jnp.isfinite(q), q, 0.0))

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        return chain_pk

    def make_chain_fused(K):
        @jax.jit
        def chain_f(banded, pks, covered):
            def body(i, acc):
                cov = covered.at[i].set(True)
                q = banded_test_forward_packed(
                    params, banded, pks, cov, act_dtype=jnp.bfloat16,
                    interpret=False, fuse_sage=True,
                )
                return acc + jnp.sum(jnp.where(jnp.isfinite(q), q, 0.0))

            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        return chain_f

    t_fwd = timed_slope(make_chain, Ks, banded, covered0)
    if jax.default_backend() in ("tpu", "axon"):
        t_pk = timed_slope(make_chain_pk, Ks, banded, pks, covered0)
        t_fu = timed_slope(make_chain_fused, Ks, banded, pks, covered0)
    else:  # interpret-mode Pallas timing is meaningless; skip off-TPU
        t_pk = float("nan")
        t_fu = float("nan")
    on_tpu = t_pk == t_pk  # NaN-off-TPU guard: keep the JSON line strict
    return dict(
        model_fwd_ms=round(t_fwd * 1e3, 2),
        model_fwd_edges_per_s=round(e_dir / t_fwd, 1),
        model_fwd_packed_ms=round(t_pk * 1e3, 2) if on_tpu else None,
        model_fwd_packed_edges_per_s=round(e_dir / t_pk, 1) if on_tpu else None,
        model_fwd_fused_ms=round(t_fu * 1e3, 2) if on_tpu else None,
        model_fwd_fused_edges_per_s=round(e_dir / t_fu, 1) if on_tpu else None,
        n=n, directed_edges=e_dir,
    )


def bench_train_step(Ks=(8, 24)):
    import jax
    import jax.numpy as jnp
    import optax

    from mdcommunity_tpu.env.batch import make_batch_inputs
    from mdcommunity_tpu.env.env import batched_reset
    from mdcommunity_tpu.graphs.duplex import stack_graphs
    from mdcommunity_tpu.graphs.gmm import generate_pool
    from mdcommunity_tpu.models.net import init_params
    from mdcommunity_tpu.rl.dqn import train_step

    rng = np.random.default_rng(0)
    graphs = generate_pool(rng, 64, 30, 50, 64, 2048, False, "none")
    gb = stack_graphs(graphs)
    state = batched_reset(gb)
    params = init_params(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    inputs = make_batch_inputs(gb, state.covered, state.sever, dense=True)
    actions = jnp.argmax(inputs.deg[:, 0], axis=1).astype(jnp.int32)
    rewards = jnp.zeros((64,), jnp.float32)
    terminal = jnp.zeros((64,), bool)
    live_edges = float(jnp.sum(inputs.deg))  # directed live edges, batch-wide

    def make_chain(K):
        @jax.jit
        def chain(params, target, opt_state):
            def body(i, carry):
                p, o = carry
                new_p, new_o, loss, *_ = train_step(
                    p, target, o, gb, state.covered, state.sever, actions,
                    rewards, state.covered, state.sever, terminal,
                    optimizer=optimizer,
                )
                return (new_p, new_o)

            p, o = jax.lax.fori_loop(0, K, body, (params, opt_state))
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x), p, jnp.float32(0)
            )

        return chain

    t_it = timed_slope(make_chain, Ks, params, params, opt_state)
    return dict(
        train_step_ms=round(t_it * 1e3, 3),
        train_steps_per_s=round(1.0 / t_it, 1),
        train_edges_per_s=round(live_edges / t_it, 1),
        batch=64,
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing the harness; "
                         "env vars alone do not switch platforms here)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = dict(metric="model_level_throughput")
    out.update(bench_banded_forward())
    out.update(bench_train_step())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
