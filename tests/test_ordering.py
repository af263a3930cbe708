"""Bandwidth-reducing orderings (graphs/ordering.py): RCM, circular
barycenter seriation, and the spill-aware selection used by
build_banded_duplex."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

def test_ring_seriation_recovers_shuffled_ring(rng):
    """The r03 1M-probe failure mode: RCM leaves ~10-20% of a shuffled-id
    ring-local small-world graph's edges outside the guaranteed band, while
    circular barycenter seriation (warm-started from RCM) recovers the ring
    to <2% band miss; best_band_order must pick it."""
    from mdcommunity_tpu.graphs.ordering import (
        apply_order,
        band_miss_fraction,
        best_band_order,
        rcm_order,
        ring_seriation_order,
    )

    n = 4096
    perm = rng.permutation(n)
    layers = []
    for _ in range(2):
        e = n * 3
        src = rng.integers(0, n, e)
        off = np.minimum(
            (8.0 * (rng.pareto(2.5, e) + 1.0)).astype(np.int64), n // 2 - 1
        ) * rng.choice(np.array([-1, 1]), e)
        dst = (src + off) % n
        keep = src != dst
        layers.append(np.stack([perm[src[keep]], perm[dst[keep]]], 1))
    e0, e1 = layers
    srcs = [e0[:, 0], e1[:, 0]]
    dsts = [e0[:, 1], e1[:, 1]]
    rows = np.concatenate(srcs)
    cols = np.concatenate(dsts)
    B = 128

    rcm = rcm_order(srcs, dsts, n)
    s, d = apply_order(rcm, rows, cols)
    rcm_miss = band_miss_fraction(s, d, n, B)

    ser = ring_seriation_order(srcs, dsts, n)
    s, d = apply_order(ser, rows, cols)
    ser_miss = band_miss_fraction(s, d, n, B)
    assert ser_miss < 0.02, (rcm_miss, ser_miss)
    assert ser_miss < rcm_miss

    best = best_band_order(srcs, dsts, n, B)
    s, d = apply_order(best, rows, cols)
    assert band_miss_fraction(s, d, n, B) <= ser_miss + 1e-12
    # a valid permutation
    assert len(np.unique(best)) == n


def test_best_band_order_keeps_good_input_order(rng):
    """A graph already in band order must not be degraded (identity wins)."""
    from mdcommunity_tpu.graphs.ordering import (
        apply_order,
        band_miss_fraction,
        best_band_order,
    )

    n = 2048
    e = n * 3
    src = rng.integers(0, n, e)
    off = rng.integers(1, 64, e) * rng.choice(np.array([-1, 1]), e)
    dst = (src + off) % n
    srcs, dsts = [src], [dst]
    best = best_band_order(srcs, dsts, n, 128)
    s, d = apply_order(best, src, dst)
    assert band_miss_fraction(s, d, n, 128) == 0.0
