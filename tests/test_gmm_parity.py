"""GMM generator: statistical parity with the reference geometric multiplex
model (GMM.py + Hyperbolic.py — pure numpy, imported directly)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/code/MultiDismantler_unit_cost")


def _stats(edge_sets, n):
    deg = np.zeros((len(edge_sets), n))
    for i, e in enumerate(edge_sets):
        e = np.asarray(e).reshape(-1, 2)
        np.add.at(deg[i], e[:, 0], 1)
        np.add.at(deg[i], e[:, 1], 1)
    return deg


def test_gmm_statistics_match_reference(rng):
    if not hasattr(np, "mat"):
        np.mat = np.asmatrix
    import GMM as refGMM

    n, trials = 40, 60
    ref_deg, ref_overlap = [], []
    np.random.seed(0)
    import random as _random

    _random.seed(0)
    for _ in range(trials):
        e1, e2 = refGMM.GMM(n)
        deg = _stats([e1, e2], n)
        ref_deg.append([deg[0].mean(), deg[1].mean()])
        s1 = {tuple(sorted(p)) for p in np.asarray(e1).reshape(-1, 2).tolist()}
        s2 = {tuple(sorted(p)) for p in np.asarray(e2).reshape(-1, 2).tolist()}
        ref_overlap.append(len(s1 & s2) / max(min(len(s1), len(s2)), 1))

    from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges

    our_deg, our_overlap = [], []
    for _ in range(trials):
        e0, e1 = gmm_duplex_edges(n, rng)
        deg = _stats([e0, e1], n)
        our_deg.append([deg[0].mean(), deg[1].mean()])
        s0 = {tuple(sorted(p)) for p in np.asarray(e0).reshape(-1, 2).tolist()}
        s1 = {tuple(sorted(p)) for p in np.asarray(e1).reshape(-1, 2).tolist()}
        our_overlap.append(len(s0 & s1) / max(min(len(s0), len(s1)), 1))

    ref_deg = np.mean(ref_deg, axis=0)
    our_deg = np.mean(our_deg, axis=0)
    # mean degree k̄ ~ U(2,10) in both: expected ~6 with generator noise
    np.testing.assert_allclose(our_deg, ref_deg, rtol=0.25)
    # angular+kappa correlation should give substantially overlapping layers
    assert np.mean(our_overlap) > 0.5 * np.mean(ref_overlap)
