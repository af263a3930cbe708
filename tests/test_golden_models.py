"""Golden-results regression tests for the committed trained checkpoints.

The reference's main QC is committed result files diffed against new runs
(SURVEY.md §4.3: results/final_comparison_report.csv + analysis_comparison.py).
The equivalent here: each trained model under models_tpu/*_full_r1 is scored
with the batched greedy validation protocol (reference Test :738-755) on a
fixed seeded 32-graph GMM pool, and the VC is pinned.  A kernel or model
change that silently alters the trained policies' quality fails these tests.

Golden values computed on CPU float32-highest (tests/conftest.py settings);
the full-200-graph-pool values in RESULTS.md are unit 0.1213 / ce 0.1256 /
degree 0.1774 / hca 0.4104.
"""

import dataclasses
import os

import pytest

from mdcommunity_tpu.rl.dqn import DQNAgent
from mdcommunity_tpu.utils.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GOLDEN = {
    "unit_cost": 0.1194451824,
    "ce": 0.1253485084,
    "degree_cost": 0.1748573929,
    "hca": 0.3934071362,
}


@pytest.mark.parametrize("variant", sorted(GOLDEN))
def test_golden_checkpoint_vc(variant):
    ckpt = os.path.join(REPO, "models_tpu", f"{variant}_full_r1", "best_model.ckpt")
    assert os.path.isfile(ckpt), ckpt
    cfg = dataclasses.replace(Config(variant=variant), n_valid=32)
    agent = DQNAgent(cfg)
    agent.prepare_valid_data()  # before load: pool drawn from the seed-0 rng
    agent.load(ckpt)
    vc = agent.validate()
    # tolerance: wide enough for benign cross-backend numeric drift in a
    # greedy argmax rollout, far tighter than any real quality regression
    assert vc == pytest.approx(GOLDEN[variant], abs=5e-3), (variant, vc)
