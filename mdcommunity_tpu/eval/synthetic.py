"""Synthetic evaluation sweep (reference: Evaluate :563-600 + testSynthetic.py).

Sweeps network sizes × generator-parameter families ({data_g, data_gamma,
data_k}), loading pre-generated adjacency pairs when available or generating
GMM graphs on the fly, and reports AUDC mean/std + solve time + cost, writing
`result_<n>_<variant>.txt` rows in the reference's format."""

from __future__ import annotations

import glob
import os
import time
from typing import List, Optional, Tuple

import numpy as np

from mdcommunity_tpu.eval.metrics import dismantle_greedy
from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
from mdcommunity_tpu.graphs.io import duplex_from_layers, load_synthetic_pair


def evaluate_synthetic_dir(
    params,
    data_dir: str,
    size_name: str,
    n_graphs: int = 20,
    variant: str = "unit_cost",
) -> Tuple[float, float, float, float, float]:
    """Evaluate stored adj1_i.npy/adj2_i.npy pairs under data_dir/syn_<size>/.

    Returns (score_mean, score_std, time_mean, time_std, cost_mean) — the
    reference Evaluate's return contract (:600)."""
    scores, times, costs = [], [], []
    for i in range(n_graphs):
        a1 = os.path.join(data_dir, f"syn_{size_name}", f"adj1_{i}.npy")
        a2 = os.path.join(data_dir, f"syn_{size_name}", f"adj2_{i}.npy")
        if not (os.path.exists(a1) and os.path.exists(a2)):
            break
        g = load_synthetic_pair(a1, a2, degree_cost=(variant == "degree_cost"))
        t0 = time.time()
        sol, score, _ = dismantle_greedy(params, g, variant=variant)
        times.append(time.time() - t0)
        scores.append(score)
        costs.append(len(sol) / int(g.n_nodes))
    if not scores:
        raise FileNotFoundError(f"no synthetic pairs under {data_dir}/syn_{size_name}")
    return (
        float(np.mean(scores)), float(np.std(scores)),
        float(np.mean(times)), float(np.std(times)), float(np.mean(costs)),
    )


def evaluate_synthetic_generated(
    params,
    sizes: List[int],
    n_graphs: int = 20,
    variant: str = "unit_cost",
    seed: int = 0,
    g_corr: float = 0.5,
    gamma: float = 2.5,
    kbar: Optional[float] = None,
) -> List[dict]:
    """Generate GMM graphs on the fly (when no stored sweep data exists) and
    evaluate; one result row per size."""
    rng = np.random.default_rng(seed)
    rows = []
    for n in sizes:
        scores, times, costs = [], [], []
        for _ in range(n_graphs):
            e0, e1 = gmm_duplex_edges(
                n, rng, g=g_corr, gamma1=gamma, gamma2=gamma, kbar1=kbar, kbar2=kbar
            )
            g = duplex_from_layers(
                n, e0, e1, degree_cost=(variant == "degree_cost")
            )
            if int(g.max_rank) <= 1:
                continue
            t0 = time.time()
            sol, score, _ = dismantle_greedy(params, g, variant=variant)
            times.append(time.time() - t0)
            scores.append(score)
            costs.append(len(sol) / n)
        rows.append(
            dict(
                size=n,
                score_mean=float(np.mean(scores)) if scores else float("nan"),
                score_std=float(np.std(scores)) if scores else float("nan"),
                time_mean=float(np.mean(times)) if times else float("nan"),
                cost_mean=float(np.mean(costs)) if costs else float("nan"),
            )
        )
    return rows


def write_result_rows(path: str, rows: List[dict], variant: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(
                f"{r['size']} {r['score_mean']:.8f}±{r['score_std']:.8f} "
                f"time {r['time_mean']:.4f}s cost {r['cost_mean']:.6f}\n"
            )


def evaluate_synthetic_sweep(
    params,
    sweep_param: str,
    values: List[float],
    size: int = 128,
    n_graphs: int = 20,
    variant: str = "unit_cost",
    seed: int = 0,
) -> List[dict]:
    """Sweep one GMM generator parameter (the reference's data_g / data_gamma /
    data_k dataset families, testSynthetic.py:14-39): angular correlation g,
    degree exponent gamma, or mean degree k̄.  One result row per value."""
    assert sweep_param in ("g", "gamma", "k")
    rows = []
    for v in values:
        kw = dict(g_corr=0.5, gamma=2.5, kbar=None)
        if sweep_param == "g":
            kw["g_corr"] = v
        elif sweep_param == "gamma":
            kw["gamma"] = v
        else:
            kw["kbar"] = v
        (row,) = evaluate_synthetic_generated(
            params, [size], n_graphs=n_graphs, variant=variant,
            seed=seed, **kw,
        )
        row[sweep_param] = v
        rows.append(row)
    return rows
