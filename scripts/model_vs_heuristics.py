"""Model vs adaptive heuristics on identical seeded GMM duplex graphs,
identical scoring — the RESULTS.md head-to-head table.

--syn-stop applies the baseline `_syn` scripts' early-stop convention
(stop once LMCC rank <= sqrt(N), hda_2max_syn.py:78-81) to BOTH the model
rollout and every heuristic, so the sweep is convention-consistent with the
reference's synthetic baselines.  Default: dismantle to rank 1 (the real-data
convention).

Usage:
  python scripts/model_vs_heuristics.py --model models_tpu/unit_cost_full_r1/best_model.ckpt \
      [--sizes 64 128 256] [--n-graphs 15] [--syn-stop] [--cpu]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--sizes", type=int, nargs="*", default=[64, 128, 256])
    ap.add_argument("--n-graphs", type=int, default=15)
    ap.add_argument("--syn-stop", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import pickle

    from mdcommunity_tpu.eval.baselines import heuristic_dismantle
    from mdcommunity_tpu.eval.metrics import dismantle_greedy
    from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
    from mdcommunity_tpu.graphs.io import duplex_from_layers

    with open(args.model, "rb") as f:
        params = pickle.load(f)["params"]

    methods = [
        ("model", None, None),
        ("hda_2max", "degree", "max2"),
        ("hda_add", "degree", "add"),
        ("ci_2max", "ci", "max2"),
    ]
    rows = []
    for n in args.sizes:
        rng = np.random.default_rng(args.seed)
        scores = {name: [] for name, *_ in methods}
        made = 0
        while made < args.n_graphs:
            e0, e1 = gmm_duplex_edges(n, rng)
            g = duplex_from_layers(n, e0, e1)
            if int(g.max_rank) <= max(1, int(np.sqrt(n))):
                continue
            made += 1
            for name, method, combine in methods:
                if name == "model":
                    _, s, _ = dismantle_greedy(
                        params, g, syn_stop=args.syn_stop
                    )
                else:
                    _, s, _ = heuristic_dismantle(
                        g, method, combine, syn_stop=args.syn_stop
                    )
                scores[name].append(s)
        row = dict(n=n, convention="syn" if args.syn_stop else "rank1")
        for name in scores:
            row[name] = round(float(np.mean(scores[name])), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
