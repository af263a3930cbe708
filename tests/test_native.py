"""Native C++ host engine (mdcommunity_tpu/native) vs python oracles.

The cascade engine must match env/host_env.HostDuplexEnv (itself matching the
reference MvcEnv + Mcc.MCC semantics, tested in test_cascade.py) EXACTLY:
same ranks, scores, curves, terminal flags, and severed-edge sets.  The GMM
pair connector is checked statistically (same Fermi-Dirac distribution,
different RNG stream).
"""

import numpy as np
import pytest

from mdcommunity_tpu.env.host_env import HostDuplexEnv, make_host_env
from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges

native = pytest.importorskip("mdcommunity_tpu.native")
if native.load() is None:
    pytest.skip("no native toolchain", allow_module_level=True)


def _random_duplex(rng, lo=10, hi=60):
    while True:
        n = int(rng.integers(lo, hi))
        e0, e1 = gmm_duplex_edges(n, rng)
        if len(e0) and len(e1):
            return n, e0, e1


@pytest.mark.parametrize("degree_cost", [False, True])
def test_cascade_exact_parity(rng, degree_cost):
    for _ in range(10):
        n, e0, e1 = _random_duplex(rng)
        w = rng.random((2, n)) if degree_cost else None
        ref = HostDuplexEnv(n, e0, e1, w)
        nat = native.NativeDuplexEnv(n, e0, e1, w)
        assert (nat.max_rank, nat.rank) == (ref.max_rank, ref.rank)
        steps = 0
        while not ref.terminal and steps < n:
            cands = np.flatnonzero(
                nat.alive_nodes(0) & nat.alive_nodes(1) & ~ref.covered
            )
            if len(cands) == 0:
                break
            a = int(rng.choice(cands))
            r1, s1 = ref.step(a, degree_cost=degree_cost)
            r2, s2 = nat.step(a, degree_cost=degree_cost)
            assert r1 == r2
            assert abs(ref.score - nat.score) < 1e-12
            assert ref.terminal == nat.terminal
            for layer in range(2):
                assert (
                    set(map(tuple, np.sort(s1[layer], axis=1)))
                    == set(map(tuple, np.sort(s2[layer], axis=1)))
                )
            np.testing.assert_array_equal(ref.covered, nat.covered)
            for layer in range(2):
                np.testing.assert_array_equal(
                    ref.sever[layer], nat.sever[layer]
                )
            steps += 1
        assert np.allclose(ref.curve, nat.curve)


def test_reset_restores_initial_state(rng):
    n, e0, e1 = _random_duplex(rng)
    nat = native.NativeDuplexEnv(n, e0, e1)
    rank0, curve0 = nat.rank, nat.curve
    for _ in range(3):
        cands = np.flatnonzero(nat.alive_nodes(0) & nat.alive_nodes(1))
        if len(cands) == 0:
            break
        nat.step(int(cands[0]))
    nat.reset()
    assert nat.rank == rank0
    assert nat.curve == curve0
    assert nat.score == 0.0
    assert not nat.covered.any()


def test_make_host_env_prefers_native(rng):
    n, e0, e1 = _random_duplex(rng)
    env = make_host_env(n, e0, e1)
    assert isinstance(env, native.NativeDuplexEnv)


def test_gmm_connector_distribution(rng):
    """Native edge count within 6 sigma of the analytic expectation."""
    from mdcommunity_tpu.graphs.gmm import _kmin, _mu, sample_kappa

    n, kbar, gamma, T = 1500, 6.0, 2.5, 0.4
    kappa = sample_kappa(rng, n, _kmin(kbar, gamma), gamma)
    theta = 2 * np.pi * rng.random(n)
    mu = _mu(kbar, T)
    edges = native.gmm_connect(kappa, theta, T, mu, seed=7)
    dt = np.abs(theta[:, None] - theta[None, :])
    dist = (n / (2 * np.pi)) * np.abs(np.pi - np.abs(np.pi - dt))
    with np.errstate(over="ignore", divide="ignore"):
        p = 1.0 / (1.0 + (dist / (mu * np.outer(kappa, kappa))) ** (1 / T))
    iu, ju = np.triu_indices(n, k=1)
    expect = p[iu, ju].sum()
    assert abs(len(edges) - expect) < 6 * np.sqrt(expect) + 10
    assert (edges[:, 0] < edges[:, 1]).all()
    assert edges.min() >= 0 and edges.max() < n


def test_gmm_generator_uses_native_above_threshold(rng):
    """gmm_duplex_edges at n >= 512 goes through the native connector and
    still produces sane duplex graphs."""
    e0, e1 = gmm_duplex_edges(600, rng)
    for e in (e0, e1):
        assert len(e) > 600  # kbar >= 2 -> at least ~n edges
        assert e.max() < 600


@pytest.mark.parametrize("engine", ["native", "scipy"])
def test_step_many_matches_sequential_final_state(rng, engine):
    """Batched removal (ONE cascade per batch, the 10^6-node StepRatio
    amortization): the FINAL covered/severed/rank/terminal state must
    exactly equal sequential stepping — the MCC fixed point after removing
    a set is order-independent — and the batched score may deviate only
    within the documented bound (k/n per dismantling, pessimistic side)."""
    for _ in range(6):
        n, e0, e1 = _random_duplex(rng, 24, 60)
        mk = (
            (lambda: native.NativeDuplexEnv(n, e0, e1))
            if engine == "native"
            else (lambda: HostDuplexEnv(n, e0, e1))
        )
        seq, bat = mk(), mk()
        if seq.terminal:
            continue
        k = 4
        while not seq.terminal:
            cands = np.flatnonzero(~seq.covered)
            acts = cands[rng.permutation(len(cands))[:k]]
            new_b = []
            for a in acts:
                if seq.terminal:
                    break
                seq.step(int(a))
                new_b.append(int(a))
            # batch removes the SAME nodes the sequential loop removed
            if not new_b:
                break
            r_b, _, removed = bat.step_many(np.asarray(new_b))
            assert removed == len(new_b)
            assert r_b == seq.rank
            np.testing.assert_array_equal(seq.covered, bat.covered)
            # sever masks agree on every LIVE-RELEVANT edge (both endpoints
            # uncovered).  Dead edges may differ: an edge severed mid-batch
            # whose endpoint is covered later in the same batch stays merely
            # dead in batched mode — the liveness scales kill it either way
            for layer in range(2):
                e = seq.edges[layer]
                live_rel = ~seq.covered[e[:, 0]] & ~seq.covered[e[:, 1]]
                np.testing.assert_array_equal(
                    seq.sever[layer][live_rel], bat.sever[layer][live_rel]
                )
            assert seq.terminal == bat.terminal
        # batched curve takes the post-batch rank: score can only be <= the
        # sequential score, by at most k/n (+ fp slack)
        assert bat.score <= seq.score + 1e-9
        assert seq.score - bat.score <= k / n + 1e-9
        assert len(bat.curve) == len(seq.curve)


def test_step_many_skips_covered_and_oob(rng):
    n, e0, e1 = _random_duplex(rng, 24, 60)
    env = native.NativeDuplexEnv(n, e0, e1)
    a0 = int(np.flatnonzero(~env.covered)[0])
    env.step(a0)
    t0 = env.t
    _, _, removed = env.step_many(np.asarray([a0, -1, n + 5]))
    assert removed == 0 and env.t == t0
