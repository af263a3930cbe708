"""Tests for the `_syn` early-stop convention and the weighted (drawWeight)
plot semantics — the two PARITY.md claims flagged by round 1's review.

Reference semantics:
  * baseline/HDA/hda_2max_syn.py:78-81 — `new_num = math.sqrt(N)/ND_ori;
    while ND_mcc[-1] > new_num:` i.e. the sweep stops once the LMCC rank
    falls to sqrt(N), not 1.
  * MultiDismantler_degree_cost/drawWeight.py:63-68 — the weighted plot's x
    axis is the CUMULATIVE COST read from the cost file (trailing score line
    dropped), y the MaxCCList values.
"""

import math
import os

import numpy as np
import pytest

from mdcommunity_tpu.eval.baselines import heuristic_dismantle
from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
from mdcommunity_tpu.graphs.io import duplex_from_layers


def _graph(n=80, seed=3):
    rng = np.random.default_rng(seed)
    e0, e1 = gmm_duplex_edges(n, rng)
    g = duplex_from_layers(n, e0, e1)
    assert int(g.max_rank) > math.sqrt(n)
    return g


def test_syn_stop_convention():
    g = _graph()
    n = int(g.n_nodes)
    max_rank = float(g.max_rank)
    sol_full, score_full, curve_full = heuristic_dismantle(g, "degree", "max2")
    sol_syn, score_syn, curve_syn = heuristic_dismantle(
        g, "degree", "max2", syn_stop=True
    )
    # syn run stops strictly earlier and is a prefix of the full run
    # (identical deterministic selection rule)
    assert len(sol_syn) < len(sol_full)
    assert sol_full[: len(sol_syn)] == sol_syn
    assert score_syn < score_full
    # stop condition: last normalized rank <= sqrt(N)/LMCC0, and the
    # previous one was still above it (stopped as soon as reached)
    thresh = math.sqrt(n) / max_rank
    assert curve_syn[-1] <= thresh
    assert all(v > thresh for v in curve_syn[:-1])
    # the full-convention run goes all the way to rank 1
    assert curve_full[-1] == pytest.approx(1.0 / max_rank)


def test_syn_stop_model_rollout():
    """dismantle_greedy honors the same convention for model-side sweeps."""
    import jax

    from mdcommunity_tpu.eval.metrics import dismantle_greedy
    from mdcommunity_tpu.models.net import init_params

    g = _graph(n=48, seed=5)
    n = int(g.n_nodes)
    params = init_params(jax.random.PRNGKey(0))
    sol_full, _, curve_full = dismantle_greedy(params, g)
    sol_syn, _, curve_syn = dismantle_greedy(params, g, syn_stop=True)
    thresh = math.sqrt(n) / float(g.max_rank)
    assert len(sol_syn) <= len(sol_full)
    assert curve_syn[-1] <= thresh
    assert all(v > thresh for v in curve_syn[1:-1])  # [0] is the leading 1.0


def test_weighted_plot_consumes_cost_curve(tmp_path):
    from mdcommunity_tpu.eval.plots import (
        plot_lmcc_curves,
        read_cost_file,
        read_lmcc_file,
    )
    from mdcommunity_tpu.eval.writers import write_cost_curve, write_lmcc_curve

    n = 12
    weights = np.stack([np.arange(1, n + 1, dtype=float)] * 2)
    solution = [3, 7, 1]
    cost_path = str(tmp_path / f"Cost_demo.txt")
    write_cost_curve(cost_path, weights, solution, n, score=0.123)
    curve = [0.9, 0.6, 0.3]
    lmcc_path = str(tmp_path / "NormalizedLMCC_demo.txt")
    write_lmcc_curve(lmcc_path, curve, n, max_rank=10, score_mean=0.1, score_std=0.0)

    x = read_cost_file(cost_path)
    # file = 0-line + n-1 removal lines + score line; score dropped -> n values
    assert x[0] == 0.0 and len(x) == n
    assert np.all(np.diff(x) > 0)
    assert 0.123 not in x  # the score line must not be on the axis
    y = read_lmcc_file(lmcc_path)
    assert len(y) == n  # mean/std stripped

    out = str(tmp_path / "weighted.png")
    plot_lmcc_curves(
        {"demo": (cost_path, lmcc_path)}, out, title="t", weighted=True
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0

    # unweighted still takes bare paths
    out2 = str(tmp_path / "unweighted.png")
    plot_lmcc_curves({"demo": lmcc_path}, out2)
    assert os.path.exists(out2)
