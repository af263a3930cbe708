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
