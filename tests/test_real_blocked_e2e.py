"""End-to-end coverage of the LARGE-GRAPH real-data path: cli test-real /
evaluate_real through the blocked branch (eval/real.py — RCM reorder + banded
device forward + host union-find env + permute-back), which round 1 shipped
with only piecewise tests.

The critical invariant is the id permutation: the blocked path relabels nodes
(RCM order), dismantles in banded ids, and maps the solution back via
`perm` — so replaying the returned ORIGINAL-id solution on the ORIGINAL-id
graph must reproduce the reported score exactly.  Reference file formats:
MultiDismantler_torch.py:673-707, testReal.py:88-95.
"""

import os

import numpy as np
import pytest

from mdcommunity_tpu.eval.metrics import solution_robustness
from mdcommunity_tpu.eval.real import evaluate_real
from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
from mdcommunity_tpu.graphs.io import duplex_from_layers


@pytest.fixture(scope="module")
def edges_fixture(tmp_path_factory):
    """A synthetic .edges multiplex (layer u v, 1-based ids) big enough to be
    interesting, with the blocked threshold lowered below it in the test."""
    n = 220
    rng = np.random.default_rng(7)
    e0, e1 = gmm_duplex_edges(n, rng)
    path = tmp_path_factory.mktemp("real") / "synthetic_multiplex.edges"
    with open(path, "w") as f:
        for lid, edges in ((1, e0), (2, e1)):
            for u, v in edges:
                f.write(f"{lid} {u + 1} {v + 1}\n")
    return str(path), n, (e0, e1)


@pytest.mark.parametrize("variant", ["unit_cost", "degree_cost", "ce", "hca"])
def test_blocked_real_path_end_to_end(edges_fixture, tmp_path, variant):
    import jax

    from mdcommunity_tpu.models.net import init_params

    path, n, (e0, e1) = edges_fixture
    if variant == "hca":
        from mdcommunity_tpu.models.hca import init_hca_params

        params = init_hca_params(jax.random.PRNGKey(0))
    else:
        params = init_params(
            jax.random.PRNGKey(0), node_feat_dim=3 if variant == "ce" else 2
        )
    out = str(tmp_path / variant)

    sol, solve_time, score = evaluate_real(
        params,
        os.path.dirname(path),
        os.path.basename(path),
        out,
        variant=variant,
        n_nodes=n,
        layers=(1, 2),
        blocked_threshold=64,  # force the large-graph branch at this n
    )

    # solution ids are valid ORIGINAL ids: in range, unique
    assert len(sol) > 0
    assert all(0 <= v < n for v in sol)
    assert len(set(sol)) == len(sol)

    # permute-back correctness: replaying the original-id solution on the
    # original-id graph reproduces the blocked path's score
    g = duplex_from_layers(n, e0, e1, degree_cost=(variant == "degree_cost"))
    replay_score, _ = solution_robustness(
        g, sol, degree_cost=(variant == "degree_cost")
    )
    assert replay_score == pytest.approx(score, rel=1e-5)

    # written files parse and match the reference formats
    sub = os.path.join(out, "StepRatio_0.0000")
    base = "synthetic_multiplex"
    sol_lines = open(os.path.join(sub, f"Soluion_{base}_12.txt")).read().split()
    assert [int(x) for x in sol_lines] == sol
    lmcc = [float(x) for x in
            open(os.path.join(sub, f"NormalizedLMCC_{base}_12.txt")).read().split()]
    assert len(lmcc) == n + 2  # n curve lines + score mean + std
    assert lmcc[-2] == pytest.approx(score, abs=1e-6)
    assert all(0 <= v <= 1.0 + 1e-9 for v in lmcc[:-2])
    csv_path = os.path.join(out, "time&audc_real.csv")
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0] == "dataset,time,audc"
    name, t, audc = rows[1].split(",")
    assert float(audc) == pytest.approx(score, abs=1e-6)
    if variant == "degree_cost":
        cost = [float(x) for x in
                open(os.path.join(sub, f"Cost_{base}_12.txt")).read().split()]
        assert cost[0] == 0.0 and cost[-1] == pytest.approx(score, abs=1e-6)
        assert all(b >= a for a, b in zip(cost[:-2], cost[1:-1]))


def test_blocked_matches_small_path(edges_fixture, tmp_path):
    """The blocked branch and the plain (small-graph) branch agree on the
    solution and score for the same graph and parameters."""
    import jax

    from mdcommunity_tpu.models.net import init_params

    path, n, _ = edges_fixture
    params = init_params(jax.random.PRNGKey(0))
    sol_b, _, score_b = evaluate_real(
        params, os.path.dirname(path), os.path.basename(path),
        str(tmp_path / "blocked"), n_nodes=n, layers=(1, 2),
        blocked_threshold=64,
    )
    sol_s, _, score_s = evaluate_real(
        params, os.path.dirname(path), os.path.basename(path),
        str(tmp_path / "small"), n_nodes=n, layers=(1, 2),
        blocked_threshold=1 << 30,
    )
    assert score_b == pytest.approx(score_s, rel=1e-4)
    assert len(sol_b) == len(sol_s)


def test_blocked_real_path_hca_packed(edges_fixture, tmp_path):
    """variant='hca' with packed=True runs the Pallas packed HCA forward
    end-to-end through evaluate_real (round 4: --packed is no longer
    downgraded for HCA) and matches the XLA-engine blocked path's solution
    under the same f32-precise eval."""
    import jax

    from mdcommunity_tpu.models.hca import init_hca_params

    path, n, (e0, e1) = edges_fixture
    params = init_hca_params(jax.random.PRNGKey(0))

    sol_pk, _, score_pk = evaluate_real(
        params, os.path.dirname(path), os.path.basename(path),
        str(tmp_path / "hca_pk"), variant="hca", n_nodes=n, layers=(1, 2),
        blocked_threshold=64, packed=True,
    )
    sol_x, _, score_x = evaluate_real(
        params, os.path.dirname(path), os.path.basename(path),
        str(tmp_path / "hca_x"), variant="hca", n_nodes=n, layers=(1, 2),
        blocked_threshold=64, packed=False,
    )
    assert len(sol_pk) > 0
    assert all(0 <= v < n for v in sol_pk)
    assert len(set(sol_pk)) == len(sol_pk)
    # the two engines agree to f32 accumulation order (pinned at rtol 2e-4 in
    # tests/test_hca_banded.py); over a full greedy rollout a near-tie can
    # still flip a pick, so e2e parity is asserted at the score level
    prefix = min(50, len(sol_pk), len(sol_x))
    assert sol_pk[:prefix] == sol_x[:prefix]
    np.testing.assert_allclose(score_pk, score_x, rtol=0.05, atol=0.005)
