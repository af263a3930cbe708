"""Large-graph dismantling capability/time demo.

The reference capsule ships NO real multiplex data (only result files), so the
real-data solve times in BASELINE.md (e.g. homo_genetic N=18222: 1582.6 s on
the author's GPU) cannot be re-run on the same graphs.  This demo measures our
full testReal pipeline (RCM ordering + dense-band device forward + host
cascade, eval/real.py) on synthetic duplex networks OF THE SAME SCALE, written
in the reference's `.edges` format and evaluated through the same entry point
as real data.

Usage: python scripts/large_graph_demo.py [--model models_tpu/unit_cost_full_r1/best_model.ckpt]
Prints one JSON line per size.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_duplex_edges(n, avg_deg, rng, shuffle=True):
    """Locality-ordered duplex surrogate: circular power-law offsets per layer
    (the GMM connection kernel's tail, see bench.py).  shuffle=True permutes
    the ids so the pipeline's RCM reordering does real work; shuffle=False
    keeps the generator's angular order (a well-banded build, the regime of
    GMM/real graphs whose natural orderings band cleanly)."""
    perm = rng.permutation(n) if shuffle else np.arange(n)
    layers = []
    for _ in range(2):
        e = n * avg_deg // 2
        src = rng.integers(0, n, e)
        off = (8.0 * (rng.pareto(2.5, e) + 1.0)).astype(np.int64)
        off = np.minimum(off, n // 2 - 1) * rng.choice(np.array([-1, 1]), e)
        dst = (src + off) % n
        keep = src != dst
        layers.append(np.stack([perm[src[keep]], perm[dst[keep]]], 1))
    return layers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models_tpu/unit_cost_full_r1/best_model.ckpt")
    ap.add_argument("--sizes", type=int, nargs="*", default=[4092, 18222])
    ap.add_argument("--avg-deg", type=int, default=6)
    ap.add_argument("-o", "--output", default="/tmp/large_demo")
    ap.add_argument("--packed", action="store_true",
                    help="Pallas packed band engine for the forward")
    ap.add_argument("--variant", default="unit_cost",
                    choices=["unit_cost", "degree_cost", "ce", "hca"])
    ap.add_argument("--step-ratio", type=float, default=0.0,
                    help="testReal stepRatio batching (0 = one node/call)")
    ap.add_argument("--batch-env", action="store_true",
                    help="ONE host cascade per StepRatio batch "
                         "(env.step_many; AUDC bias <= step/n)")
    ap.add_argument("--no-shuffle", action="store_true",
                    help="keep the generator's angular order (well-banded "
                         "build; no RCM work, zero/low spill)")
    ap.add_argument("--fast", action="store_true",
                    help="bf16 eval forward (precise=False)")
    args = ap.parse_args()

    from mdcommunity_tpu.eval.real import evaluate_real
    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config

    agent = DQNAgent(Config(variant=args.variant), seed=0)
    if args.model.endswith(".ckpt") and os.path.exists(args.model):
        try:
            agent.load(args.model)
        except Exception:
            agent.load_torch(args.model)

    os.makedirs(args.output, exist_ok=True)
    # reference solve times for the same N (different graphs; scale context
    # only): results/final_comparison_report.csv rows 9 & 11
    ref_times = {4092: 107.14, 18222: 1582.64}
    rng = np.random.default_rng(0)
    for n in args.sizes:
        e0, e1 = synth_duplex_edges(
            n, args.avg_deg, rng, shuffle=not args.no_shuffle
        )
        path = os.path.join(args.output, f"synthetic_{n}_multiplex.edges")
        with open(path, "w") as f:
            for lid, edges in ((1, e0), (2, e1)):
                for u, v in edges:
                    f.write(f"{lid} {u + 1} {v + 1}\n")
        t0 = time.time()
        sol, solve_time, score = evaluate_real(
            agent.params, args.output, f"synthetic_{n}_multiplex.edges",
            os.path.join(args.output, "results"),
            n_nodes=n, layers=(1, 2), packed=args.packed,
            variant=args.variant, step_ratio=args.step_ratio,
            batch_env=args.batch_env, precise=not args.fast,
        )
        print(json.dumps(dict(
            n=n, edges=int(len(e0) + len(e1)), solve_s=round(solve_time, 2),
            total_s=round(time.time() - t0, 2), audc=round(float(score), 6),
            removed=len(sol),
            ref_same_scale_s=ref_times.get(n),
        )))


if __name__ == "__main__":
    main()
