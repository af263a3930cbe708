"""The 10^6-scale banded training loop (rl/big_trainer.py), exercised small.

The loop is the reference Train() (MultiDismantler_torch.py:433-547) at
StepRatio macro granularity: eps-greedy top-k rollout on ONE banded duplex,
batched host cascade, TD targets r + gamma * max Q_target(s'), fit through
banded_train_loss, periodic target snapshots.  These tests run it on small
graphs (CPU) and check the loop mechanics + the TD/reward contract; the
gp-sharded trajectory parity runs in __graft_entry__.dryrun_multichip.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mdcommunity_tpu.env.host_env import make_host_env  # noqa: E402
from mdcommunity_tpu.graphs.banded import build_banded_duplex  # noqa: E402
from mdcommunity_tpu.rl.big_trainer import train_banded_loop  # noqa: E402


def _small_duplex(rng, n=400, deg=6):
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from scripts.large_graph_demo import synth_duplex_edges

    return synth_duplex_edges(n, deg, rng, shuffle=True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n = 400
    e0, e1 = _small_duplex(rng, n)
    banded, perm, (oe0, oe1) = build_banded_duplex(n, e0, e1)

    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config

    agent = DQNAgent(Config(variant="unit_cost"), seed=0)
    return n, banded, oe0, oe1, agent.params


def test_loop_runs_and_learns_shapes(setup):
    n, banded, oe0, oe1, params = setup
    env = make_host_env(n, oe0, oe1)
    p2, hist = train_banded_loop(
        params, banded, env, iters=8, k=16, packed=False,
        target_update=4, log_every=100, log=lambda *a, **k: None,
    )
    iter_rows = [h for h in hist if "loss" in h]
    assert len(iter_rows) == 8
    # every full-k batch fitted with a finite loss
    full = [h for h in iter_rows if h["removed"] == 16]
    assert full and all(np.isfinite(h["loss"]) for h in full)
    # norm decreases monotonically-ish (removals shrink the LMCC)
    norms = [h["norm"] for h in iter_rows]
    assert norms[-1] < norms[0]
    # params actually moved
    delta = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
        )
    )
    assert delta > 0
    # env state advanced exactly k per macro-step
    assert env.t == sum(h["removed"] for h in iter_rows)


def test_episode_terminal_reset_and_audc(setup):
    n, banded, oe0, oe1, params = setup
    env = make_host_env(n, oe0, oe1)
    # large k: the episode terminates within a few macro-steps, the loop
    # must record the episode AUDC row and reset the env for the next one
    p2, hist = train_banded_loop(
        params, banded, env, iters=6, k=128, packed=False,
        target_update=3, log_every=100, log=lambda *a, **k: None,
    )
    ep_rows = [h for h in hist if "episode_end" in h]
    assert ep_rows, "no episode completed — k too small for the test graph?"
    assert ep_rows[0]["audc"] > 0
    assert ep_rows[0]["removals"] > 0
    # after a terminal the env was reset (t counts the fresh episode only)
    iter_rows = [h for h in hist if "loss" in h]
    assert env.t <= sum(h["removed"] for h in iter_rows)


def test_reward_contract_matches_env_score(setup):
    """Per-action reward -norm_post/n summed over the whole run equals the
    env's accumulated score (sign-flipped) — the step_many contract."""
    n, banded, oe0, oe1, params = setup
    env = make_host_env(n, oe0, oe1)
    train_banded_loop(
        params, banded, env, iters=5, k=16, packed=False,
        eps_start=0.0, eps_end=0.0, target_update=100, log_every=100,
        log=lambda *a, **k: None,
    )
    # env.score accumulates +norm/n per removal; the trainer's rewards are
    # the negatives, computed from the same post-batch rank
    assert env.score > 0
    assert env.t == 5 * 16
