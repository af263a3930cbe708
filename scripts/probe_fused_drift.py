"""Root-cause the fused-vs-unfused eval trajectory drift (r04 weak pt 6).

large_demo_r04.jsonl recorded AUDC 0.073417 (fused per-removal step) vs
0.073182 (unfused) on the identical 18k graph.  Both paths compute the
same math in f32-precise mode; the fused step merely compiles the sever
edits + forward + top-1 into ONE XLA module.  This probe runs both loops
step-locked on the same graph and reports:

  * the first step at which the chosen actions diverge,
  * the Q gap between the top-2 candidates at that step (tie magnitude),
  * the max |Q_fused - Q_unfused| on identical states up to divergence,
  * AUDC over a fixed-length prefix for both.

Expected outcome (testable): per-state Q differences at the 1e-6-ish
f32-reassociation level, with divergence only where the top-2 gap is of
the same order — compilation-order numerics amplified by greedy argmax,
not a state-update bug.  tests/test_banded_eval.py pins the tolerance.

Usage: python scripts/probe_fused_drift.py [--n 18222] [--steps 400]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.large_graph_demo import synth_duplex_edges


def run_loop(params, banded, env, steps, fused):
    """Greedy StepRatio-0 rollout; returns (actions, top1_vals, top_gaps)."""
    from mdcommunity_tpu.eval.metrics import dismantle_greedy_banded

    # the step==1 non-batch path is the fused loop; batch_env=True with
    # step=1 routes through the generic per-removal (unfused) loop
    sol, score, curve = dismantle_greedy_banded(
        params, banded, env, step=1, packed=True, precise=True,
        batch_env=not fused, max_steps=steps,
    )
    return sol, score, curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=18222)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--model",
                    default="models_tpu/unit_cost_full_r4/best_model.ckpt")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mdcommunity_tpu.env.host_env import make_host_env
    from mdcommunity_tpu.graphs.banded import build_banded_duplex
    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config

    agent = DQNAgent(Config(variant="unit_cost"), seed=0)
    try:
        agent.load(args.model)
    except Exception:
        agent.load_torch(args.model)
    params = agent.params

    rng = np.random.default_rng(args.seed)
    e0, e1 = synth_duplex_edges(args.n, 6, rng, shuffle=True)
    banded, perm, (oe0, oe1) = build_banded_duplex(args.n, e0, e1)

    envf = make_host_env(args.n, oe0, oe1)
    sol_f, score_f, curve_f = run_loop(params, banded, envf, args.steps, True)
    envu = make_host_env(args.n, oe0, oe1)
    sol_u, score_u, curve_u = run_loop(params, banded, envu, args.steps, False)

    div = next((i for i, (a, b) in enumerate(zip(sol_f, sol_u)) if a != b),
               None)
    out = {
        "probe": "fused_drift",
        "n": args.n, "steps": args.steps,
        "audc_fused_prefix": round(score_f, 6),
        "audc_unfused_prefix": round(score_u, 6),
        "audc_delta": round(abs(score_f - score_u), 6),
        "first_divergence_step": div,
        "n_diverged": sum(a != b for a, b in zip(sol_f, sol_u)),
    }

    if div is not None:
        # replay the common prefix, then measure the top-2 Q gap both ways
        # at the divergence state (the tie magnitude greedy argmax flipped)
        import jax.numpy as jnp

        from mdcommunity_tpu.eval.metrics import (
            _make_fused_step, dismantle_greedy_banded,  # noqa: F401
        )
        from mdcommunity_tpu.graphs.banded import pack_duplex
        from mdcommunity_tpu.models.net_packed import banded_test_forward_packed

        env2 = make_host_env(args.n, oe0, oe1)
        b2 = banded
        pks2 = pack_duplex(b2)
        from mdcommunity_tpu.graphs.banded import apply_severs_packed
        import jax

        sever_jit = jax.jit(apply_severs_packed, static_argnames=("layer",))

        def sync(b2, pks2, ns_list):
            for layer in range(2):
                ns = ns_list[layer]
                if not len(ns):
                    continue
                k = 8
                while k < len(ns):
                    k *= 2
                s = np.zeros(k, np.int32); d = np.zeros(k, np.int32)
                v = np.zeros(k, bool)
                s[:len(ns)] = ns[:, 0]; d[:len(ns)] = ns[:, 1]
                v[:len(ns)] = True
                b2, pks2 = sever_jit(b2, pks2, layer,
                                     jnp.asarray(s), jnp.asarray(d),
                                     jnp.asarray(v))
            return b2, pks2

        b2, pks2 = sync(b2, pks2, [env2.edges[l][env2.sever[l]]
                                   for l in range(2)])
        cov = jnp.asarray(np.pad(env2.covered, (0, b2.pad_n - args.n),
                                 constant_values=True))
        for a in sol_f[:div]:
            _, ns = env2.step(int(a))
            b2, pks2 = sync(b2, pks2, ns)
            cov = cov.at[int(a)].set(True)
        with jax.default_matmul_precision("highest"):
            q = np.asarray(banded_test_forward_packed(
                params, b2, pks2, cov, precise=True))
        fin = np.isfinite(q)
        top2 = np.sort(q[fin])[::-1][:2]
        out["top2_gap_at_divergence"] = float(top2[0] - top2[1])
        out["q_range"] = float(np.nanmax(q[fin]) - np.nanmin(q[fin]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
