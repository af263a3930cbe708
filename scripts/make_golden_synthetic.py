"""Generate the committed golden synthetic-sweep artifact.

The reference's QC for the synthetic path is committed result files
(results/{CI,HDA,MultDismantler}/synthetic_cost/..., SURVEY.md §4.3) that a
re-run is diffed against.  This script produces our equivalent: a small
seeded sweep (3 sizes × trained model + 2 adaptive heuristics) written under
results_tpu/golden_synthetic/ in the reference's result_<...>.txt row format
plus a golden.json with ONLY the deterministic fields (sizes, AUDC
mean/std, cost) — solve times are machine-dependent and excluded.

Run on the CPU backend (tests/test_golden_synthetic.py regenerates on CPU and
asserts equality): python scripts/make_golden_synthetic.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = [32, 64, 128]
N_GRAPHS = 5
SEED = 0
MODEL = "models_tpu/unit_cost_full_r1/best_model.ckpt"
OUT = "results_tpu/golden_synthetic"
HEURISTICS = [("degree", "max2"), ("ci", "max2")]


def model_rows():
    from mdcommunity_tpu.eval.synthetic import evaluate_synthetic_generated
    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config

    agent = DQNAgent(Config(variant="unit_cost"), seed=0)
    agent.load(MODEL)
    return evaluate_synthetic_generated(
        agent.params, sizes=SIZES, n_graphs=N_GRAPHS, seed=SEED
    )


def heuristic_rows(method, combine):
    import numpy as np

    from mdcommunity_tpu.eval.baselines import heuristic_dismantle
    from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
    from mdcommunity_tpu.graphs.io import duplex_from_layers

    rows = []
    for n in SIZES:
        rng = np.random.default_rng(SEED + n)
        scores, costs = [], []
        for _ in range(N_GRAPHS):
            e0, e1 = gmm_duplex_edges(n, rng)
            g = duplex_from_layers(n, e0, e1)
            if int(g.max_rank) <= 1:
                continue
            sol, score, _ = heuristic_dismantle(g, method, combine)
            scores.append(score)
            costs.append(len(sol) / n)
        rows.append(
            dict(
                size=n,
                score_mean=float(np.mean(scores)),
                score_std=float(np.std(scores)),
                time_mean=0.0,
                cost_mean=float(np.mean(costs)),
            )
        )
    return rows


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mdcommunity_tpu.eval.synthetic import write_result_rows

    os.makedirs(OUT, exist_ok=True)
    golden = {"sizes": SIZES, "n_graphs": N_GRAPHS, "seed": SEED}

    rows = model_rows()
    write_result_rows(
        os.path.join(OUT, "result_synthetic_unit_cost.txt"), rows, "unit_cost"
    )
    golden["model"] = [
        {k: r[k] for k in ("size", "score_mean", "score_std", "cost_mean")}
        for r in rows
    ]

    for method, combine in HEURISTICS:
        hrows = heuristic_rows(method, combine)
        write_result_rows(
            os.path.join(OUT, f"result_synthetic_{method}_{combine}.txt"),
            hrows, method,
        )
        golden[f"{method}_{combine}"] = [
            {k: r[k] for k in ("size", "score_mean", "score_std", "cost_mean")}
            for r in hrows
        ]

    with open(os.path.join(OUT, "golden.json"), "w") as f:
        json.dump(golden, f, indent=1)
    print(json.dumps(golden))


if __name__ == "__main__":
    main()
