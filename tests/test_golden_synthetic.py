"""Golden-file regression for the synthetic sweep (reference QC pattern:
committed result files diffed against a re-run, SURVEY.md §4.3).

Regenerates a slice of results_tpu/golden_synthetic/golden.json (written by
scripts/make_golden_synthetic.py on the CPU backend) with the same seeds and
asserts the deterministic fields match.  A drift here means the model
forward, the rollout tie-breaking, the GMM generator stream, or a heuristic
changed behavior."""

import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "results_tpu", "golden_synthetic", "golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_model_rows_match_golden(golden):
    import scripts.make_golden_synthetic as mk

    rows = mk.model_rows()
    assert [r["size"] for r in rows] == golden["sizes"]
    for r, ref in zip(rows, golden["model"]):
        np.testing.assert_allclose(r["score_mean"], ref["score_mean"], rtol=1e-5)
        np.testing.assert_allclose(r["score_std"], ref["score_std"], rtol=1e-5)
        np.testing.assert_allclose(r["cost_mean"], ref["cost_mean"], rtol=1e-5)


@pytest.mark.parametrize("key", ["degree_max2", "ci_max2"])
def test_heuristic_rows_match_golden(golden, key):
    import scripts.make_golden_synthetic as mk

    method, combine = key.rsplit("_", 1)
    rows = mk.heuristic_rows(method, combine)
    for r, ref in zip(rows, golden[key]):
        np.testing.assert_allclose(r["score_mean"], ref["score_mean"], rtol=1e-5)
        np.testing.assert_allclose(r["score_std"], ref["score_std"], rtol=1e-5)
        np.testing.assert_allclose(r["cost_mean"], ref["cost_mean"], rtol=1e-5)


def test_result_files_parse(golden):
    """The committed reference-format rows agree with golden.json."""
    path = os.path.join(
        ROOT, "results_tpu", "golden_synthetic", "result_synthetic_unit_cost.txt"
    )
    lines = open(path).read().strip().splitlines()
    assert len(lines) == len(golden["model"])
    for line, ref in zip(lines, golden["model"]):
        size, score = line.split()[0], line.split()[1]
        mean, std = score.split("±")
        assert int(size) == ref["size"]
        np.testing.assert_allclose(float(mean), ref["score_mean"], atol=1e-7)
        np.testing.assert_allclose(float(std), ref["score_std"], atol=1e-7)
