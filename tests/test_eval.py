"""Eval suite: baselines vs brute force, writers, rollouts, analysis report."""

import os

import networkx as nx
import numpy as np
import pytest

from mdcommunity_tpu.eval.baselines import heuristic_dismantle
from mdcommunity_tpu.eval.metrics import dismantle_greedy, dismantle_batch_greedy
from mdcommunity_tpu.eval.writers import (
    append_time_audc,
    write_lmcc_curve,
    write_solution,
)
from mdcommunity_tpu.graphs.duplex import build_duplex, stack_graphs

from oracle import OracleEnv


def _graph(rng, n=20, p=0.2):
    g1 = nx.gnp_random_graph(n, p, seed=int(rng.integers(1 << 30)))
    g2 = nx.gnp_random_graph(n, p, seed=int(rng.integers(1 << 30)))
    g = build_duplex(n, list(g1.edges()), list(g2.edges()), 24, 256)
    return g, g1, g2


def test_hda_matches_oracle_score(rng):
    """Degree-heuristic dismantling scores agree with an oracle replay of the
    same solution."""
    for _ in range(3):
        g, g1, g2 = _graph(rng)
        if int(g.max_rank) <= 1:
            continue
        sol, score, curve = heuristic_dismantle(g, "degree", "max2")
        oe = OracleEnv(list(g1.edges()), list(g2.edges()), int(g.n_nodes))
        replay = 0.0
        for a in sol:
            oe.step(a)
        # curve entries match oracle ranks
        np.testing.assert_allclose(
            curve[1:], [r / oe.max_rank for r in oe.ranks], atol=1e-9
        )
        assert score == pytest.approx(
            sum(r / (oe.max_rank * oe.n) for r in oe.ranks), rel=1e-6
        )
        assert (np.asarray(curve[1:]) >= 0).all()
        # heuristics stop at rank 1
        assert curve[-1] * int(g.max_rank) <= 1.0 + 1e-9


@pytest.mark.parametrize("method,combine", [
    ("degree", "add"), ("ci", "max2"), ("betweenness", "max2"), ("closeness", "add"),
])
def test_baseline_methods_run(rng, method, combine):
    g, *_ = _graph(rng, n=16)
    if int(g.max_rank) <= 1:
        pytest.skip("degenerate")
    sol, score, curve = heuristic_dismantle(g, method, combine)
    assert len(sol) > 0 and score > 0


def test_protect_variant(rng):
    g, *_ = _graph(rng, n=20)
    if int(g.max_rank) <= 1:
        pytest.skip("degenerate")
    sol, _, _ = heuristic_dismantle(g, "degree", "max2", protect_frac=0.05)
    # the single protected node (top degree) must never be removed
    from mdcommunity_tpu.eval.baselines import _live_degrees

    deg = _live_degrees(
        g, np.zeros(g.pad_n, bool), np.zeros_like(np.asarray(g.edge_mask))
    )
    protected = int(np.argmax(deg.max(0)[: int(g.n_nodes)]))
    assert protected not in sol


def test_model_rollout_and_writers(tmp_path, rng):
    import jax

    from mdcommunity_tpu.models.net import init_params

    params = init_params(jax.random.PRNGKey(0))
    g, g1, g2 = _graph(rng)
    if int(g.max_rank) <= 1:
        pytest.skip("degenerate")
    sol, score, curve = dismantle_greedy(params, g, step=2)
    assert score > 0 and len(curve) == len(sol) + 1

    write_solution(str(tmp_path / "Soluion_x_12.txt"), sol)
    write_lmcc_curve(
        str(tmp_path / "NormalizedLMCC_x_12.txt"), curve,
        int(g.n_nodes), int(g.max_rank), score, 0.0,
    )
    lines = open(tmp_path / "NormalizedLMCC_x_12.txt").read().splitlines()
    assert len(lines) == int(g.n_nodes) + 2
    append_time_audc(str(tmp_path / "time&audc_real.csv"), "x", 1.5, score)
    assert "dataset" in open(tmp_path / "time&audc_real.csv").readline()


def test_batched_rollout_consistent(rng):
    import jax

    from mdcommunity_tpu.models.net import init_params

    params = init_params(jax.random.PRNGKey(0))
    graphs = []
    while len(graphs) < 3:
        g, *_ = _graph(rng)
        if int(g.max_rank) > 1:
            graphs.append(g)
    gb = stack_graphs(graphs)
    scores, covered = dismantle_batch_greedy(params, gb)
    for i, g in enumerate(graphs):
        sol, score, _ = dismantle_greedy(params, g, step=1)
        assert scores[i] == pytest.approx(score, rel=1e-5)


def test_analysis_report(tmp_path):
    a = tmp_path / "unit"
    b = tmp_path / "comm"
    for d, audc in [(a, 0.2), (b, 0.25)]:
        os.makedirs(d, exist_ok=True)
        append_time_audc(str(d / "time&audc_real.csv"), "ds1", 1.0, audc)
        append_time_audc(str(d / "time&audc_real.csv"), "ds2", 2.0, audc * 2)
    from mdcommunity_tpu.eval.analysis import comparison_report

    df = comparison_report(str(a), str(b), str(tmp_path / "report.csv"))
    assert len(df) == 2
    assert df["audc_delta_pct"].iloc[0] == pytest.approx(25.0)


def test_solution_robustness_matches_heuristic_score(rng):
    from mdcommunity_tpu.eval.baselines import heuristic_dismantle
    from mdcommunity_tpu.eval.metrics import reinsert_solution, solution_robustness
    from mdcommunity_tpu.graphs.gmm import generate_pool

    (g,) = generate_pool(rng, 1, 30, 40, 64, 1024)
    sol, score, curve = heuristic_dismantle(g, "degree", "max2")
    score2, curve2 = solution_robustness(g, sol)
    np.testing.assert_allclose(score2, score, rtol=1e-6)
    np.testing.assert_allclose(curve2, curve[1:], rtol=1e-6)

    # reinsertion returns a permutation of the solution and never scores worse
    # than a random shuffle of it
    better = reinsert_solution(g, sol)
    assert sorted(better) == sorted(set(sol))
    s_re, _ = solution_robustness(g, better)
    shuffled = list(sol)
    rng.shuffle(shuffled)
    s_sh, _ = solution_robustness(g, shuffled)
    assert s_re <= s_sh + 1e-6


def test_draw_lmcc_plot(tmp_path):
    """cli draw: overlay NormalizedLMCC files into a PNG (reference
    drawUnweight.py / drawWeight.py)."""
    from mdcommunity_tpu.cli import main as cli_main
    from mdcommunity_tpu.eval.writers import write_lmcc_curve

    paths = {}
    for label, decay in (("ours", 0.9), ("hda", 0.8)):
        p = tmp_path / f"NormalizedLMCC_{label}.txt"
        curve = [decay**t for t in range(12)]
        write_lmcc_curve(str(p), curve, 12, 10, score_mean=0.3, score_std=0.01)
        paths[label] = p
    out = tmp_path / "cmp.png"
    cli_main([
        "draw", f"ours={paths['ours']}", f"hda={paths['hda']}",
        "-o", str(out), "--title", "test",
    ])
    assert out.exists() and out.stat().st_size > 1000
