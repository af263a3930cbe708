"""EpochGraphRing: replay transitions stay bound to THEIR graphs across pool
regenerations (the reference stores graph objects in replay,
nstep_replay_mem.py:43-55; storing bare pool indices would re-bind old
transitions to new graphs)."""

import numpy as np

import jax
import jax.numpy as jnp

from mdcommunity_tpu.graphs.duplex import EpochGraphRing, index_graphs
from mdcommunity_tpu.graphs.gmm import generate_pool


def _pool(seed, count=4):
    rng = np.random.default_rng(seed)
    return generate_pool(rng, count, 12, 16, 16, 128)


def test_ring_keeps_old_epoch_graphs():
    ring = EpochGraphRing(epochs=3)
    g0 = _pool(0)
    ring.write_epoch(g0)
    assert ring.epoch == 0 and ring.base == 0 and len(ring) == 4
    # remember epoch-0 slot 1's edges
    e0_src = np.asarray(ring.stacked.src[1])

    ring.write_epoch(_pool(1))
    assert ring.epoch == 1 and ring.base == 4
    # old epoch's graph still resident at its slot
    np.testing.assert_array_equal(np.asarray(ring.stacked.src[1]), e0_src)
    # sampling draws only from the current window
    slots = ring.sample_slots(np.random.default_rng(0), 256)
    assert slots.min() >= 4 and slots.max() < 8

    # staleness: epoch-0 slots live until the ring wraps (epochs=3)
    assert ring.slots_live(np.array([1]), np.array([0])).all()
    ring.write_epoch(_pool(2))
    assert ring.slots_live(np.array([1]), np.array([0])).all()
    ring.write_epoch(_pool(3))  # wraps onto epoch-0 slots
    assert ring.base == 0
    assert not ring.slots_live(np.array([1]), np.array([0])).any()
    # the NEW occupant of slot 1 is live under its own epoch
    assert ring.slots_live(np.array([1]), np.array([3])).all()


def test_ring_s0_rows_match_graphs():
    ring = EpochGraphRing(epochs=2)
    ring.write_epoch(_pool(5))
    ring.write_epoch(_pool(6))
    from mdcommunity_tpu.env.env import batched_reset

    gids = jnp.asarray(ring.sample_slots(np.random.default_rng(1), 3))
    g = index_graphs(ring.stacked, gids)
    fresh = batched_reset(g)
    s0 = jax.tree_util.tree_map(lambda x: x[gids], ring.stacked_s0)
    np.testing.assert_array_equal(np.asarray(s0.sever), np.asarray(fresh.sever))
    np.testing.assert_array_equal(np.asarray(s0.rank), np.asarray(fresh.rank))
    np.testing.assert_array_equal(
        np.asarray(ring.s0_sever_host[np.asarray(gids)]), np.asarray(fresh.sever)
    )
