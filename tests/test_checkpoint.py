"""Checkpointing: pickle and orbax full-state round-trips (true resume —
params, target, optimizer structure, RNG, iteration)."""

import os

import jax
import jax.numpy as jnp
import pytest

from mdcommunity_tpu.rl.dqn import DQNAgent
from mdcommunity_tpu.utils.config import Config


def _agents():
    a = DQNAgent(Config(variant="unit_cost").smoke)
    a.iteration = 7
    b = DQNAgent(Config(variant="unit_cost").smoke, seed=99)
    return a, b


def _check(a, b):
    same = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda x, y: bool(jnp.all(x == y)), a.params, b.params)
    )
    assert same
    assert b.iteration == 7
    assert jax.tree_util.tree_structure(b.opt_state) == jax.tree_util.tree_structure(
        a.opt_state
    )
    assert a.nprng.bit_generator.state == b.nprng.bit_generator.state


def test_pickle_roundtrip(tmp_path):
    a, b = _agents()
    p = os.path.join(tmp_path, "ck.ckpt")
    a.save(p)
    b.load(p)
    _check(a, b)


def test_orbax_roundtrip(tmp_path):
    a, b = _agents()
    p = os.path.join(tmp_path, "ck_orbax")
    a.save_orbax(p)
    b.load(p)  # directory path dispatches to the orbax backend
    _check(a, b)


def test_train_resume_continues(tmp_path):
    """True resume: a second train() call with resume=True continues from the
    saved iteration and appends to the ModelVC file (reference behavior
    :452-490, improved: optimizer/RNG state restored exactly)."""
    import dataclasses
    import os

    cfg = dataclasses.replace(
        Config(variant="unit_cost").smoke,
        max_iteration=2, save_frequency=1, n_train=4, n_valid=2,
        warmup_games=1, warmup_traj=4, num_env=4,
    )
    d = str(tmp_path / "run")
    a = DQNAgent(cfg)
    a.train(save_dir=d, log=lambda *a_, **k: None)
    vc1 = open(os.path.join(d, "ModelVC_30_50.csv")).readlines()
    assert len(vc1) == 2  # iters 0 and 1

    cfg2 = dataclasses.replace(cfg, max_iteration=4)
    b = DQNAgent(cfg2)
    b.train(save_dir=d, resume=True, log=lambda *a_, **k: None)
    assert b.iteration == 4
    vc2 = open(os.path.join(d, "ModelVC_30_50.csv")).readlines()
    assert len(vc2) == 4  # appended, not truncated
