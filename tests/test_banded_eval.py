"""Large-graph banded eval stack: host cascade env + dense-band forward.

Parity oracles: the device env (env/env.py, itself reference-parity-tested)
and the dense [N, N] model path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcommunity_tpu.env.env import env_reset, env_step
from mdcommunity_tpu.env.host_env import HostDuplexEnv, make_host_env
from mdcommunity_tpu.graphs.banded import apply_severs, build_banded_duplex
from mdcommunity_tpu.graphs.duplex import build_duplex, stack_graphs
from mdcommunity_tpu.models.net import banded_test_forward, init_params
from mdcommunity_tpu.rl.dqn import predict_q


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rand_duplex_edges(rng, n, m):
    def layer():
        src = rng.integers(0, n, m)
        dst = (src + rng.integers(1, max(n // 3, 2), m)) % n
        e = np.unique(np.sort(np.stack([src, dst], 1), axis=1), axis=0)
        return e[e[:, 0] != e[:, 1]]

    return layer(), layer()


def _device_env(n, e0, e1, pad_n, pad_e):
    g = build_duplex(n, e0, e1, pad_n, pad_e)
    return g


def _sever_set(g, sever_mask):
    out = set()
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    for l in range(2):
        for i in np.flatnonzero(np.asarray(sever_mask[l])):
            out.add((l, min(src[l, i], dst[l, i]), max(src[l, i], dst[l, i])))
    return out


def test_host_env_matches_device_env(rng):
    for trial in range(4):
        n = int(rng.integers(20, 40))
        e0, e1 = _rand_duplex_edges(rng, n, 3 * n)
        g = _device_env(n, e0, e1, 64, 512)
        if int(g.max_rank) <= 2:
            continue
        host = HostDuplexEnv(n, e0, e1)
        dstate = env_reset(g)
        assert host.max_rank == int(g.max_rank)
        assert host.rank == int(dstate.rank)
        assert _sever_set(g, np.asarray(dstate.sever)) == {
            (l, min(u, v), max(u, v))
            for l in range(2)
            for u, v in host.edges[l][host.sever[l]]
        }
        steps = 0
        while not host.terminal and not bool(dstate.terminal) and steps < n:
            alive = np.flatnonzero(~host.covered)
            a = int(rng.choice(alive))
            host.step(a)
            dstate, _ = env_step(g, dstate, jnp.int32(a))
            assert host.rank == int(dstate.rank), (trial, steps)
            assert host.terminal == bool(dstate.terminal), (trial, steps)
            steps += 1
        np.testing.assert_allclose(host.score, float(dstate.score), rtol=1e-5)


def test_banded_forward_matches_dense(rng):
    n = 150
    e0, e1 = _rand_duplex_edges(rng, n, 4 * n)
    g = _device_env(n, e0, e1, 256, 2048)
    params = init_params(jax.random.PRNGKey(1))

    banded, perm, (oe0, oe1) = build_banded_duplex(
        n, e0, e1, S=128, B=64, reorder=False
    )
    assert np.array_equal(perm, np.arange(n))

    # advance a trajectory on the device env; mirror severs into the band
    state = env_reset(g)
    host = HostDuplexEnv(n, oe0, oe1)
    for l in range(2):
        ns = host.edges[l][host.sever[l]]
        if len(ns):
            banded = apply_severs(
                banded, l,
                jnp.asarray(ns[:, 0], jnp.int32), jnp.asarray(ns[:, 1], jnp.int32),
                jnp.ones(len(ns), bool),
            )
    for _ in range(5):
        alive = np.flatnonzero(~host.covered)
        a = int(rng.choice(alive))
        state, _ = env_step(g, state, jnp.int32(a))
        _, new_sev = host.step(a)
        for l in range(2):
            ns = new_sev[l]
            if len(ns):
                banded = apply_severs(
                    banded, l,
                    jnp.asarray(ns[:, 0], jnp.int32),
                    jnp.asarray(ns[:, 1], jnp.int32),
                    jnp.ones(len(ns), bool),
                )

    gb = stack_graphs([g])
    q_dense = np.asarray(
        predict_q(params, gb, state.covered[None], state.sever[None], "unit_cost",
                  dense=True)
    )[0]
    covered_band = jnp.asarray(
        np.pad(host.covered, (0, banded.pad_n - n), constant_values=True)
    )
    q_band = np.asarray(
        banded_test_forward(params, banded, covered_band, precise=True)
    )
    # compare on the dense graph's pad width (banded pad may differ)
    w = min(len(q_dense), len(q_band))
    finite = np.isfinite(q_dense[:w]) | np.isfinite(q_band[:w])
    assert np.array_equal(
        np.isfinite(q_dense[:w]), np.isfinite(q_band[:w])
    )
    np.testing.assert_allclose(
        q_dense[:w][finite], q_band[:w][finite], rtol=2e-4, atol=2e-4
    )


def test_banded_greedy_matches_dense_rollout(rng):
    from mdcommunity_tpu.eval.metrics import dismantle_greedy, dismantle_greedy_banded

    n = 120
    e0, e1 = _rand_duplex_edges(rng, n, 4 * n)
    g = _device_env(n, e0, e1, 128, 2048)
    params = init_params(jax.random.PRNGKey(2))

    sol_d, score_d, curve_d = dismantle_greedy(params, g, variant="unit_cost")

    banded, perm, (oe0, oe1) = build_banded_duplex(
        n, e0, e1, S=128, B=64, reorder=False
    )
    env = HostDuplexEnv(n, oe0, oe1)
    sol_b, score_b, curve_b = dismantle_greedy_banded(
        params, banded, env, variant="unit_cost", precise=True
    )
    assert sol_d == sol_b
    np.testing.assert_allclose(score_d, score_b, rtol=1e-5)
    np.testing.assert_allclose(curve_d, curve_b, rtol=1e-5)


def test_banded_greedy_step_batching_matches_dense(rng):
    """StepRatio batching (step > 1): the banded loop's device-side top-k
    selection picks the same per-call batch as the dense path's stable host
    argsort."""
    from mdcommunity_tpu.eval.metrics import dismantle_greedy, dismantle_greedy_banded

    n = 120
    e0, e1 = _rand_duplex_edges(rng, n, 4 * n)
    g = _device_env(n, e0, e1, 128, 2048)
    params = init_params(jax.random.PRNGKey(5))

    sol_d, score_d, _ = dismantle_greedy(params, g, variant="unit_cost", step=4)

    banded, _, (oe0, oe1) = build_banded_duplex(
        n, e0, e1, S=128, B=64, reorder=False
    )
    env = HostDuplexEnv(n, oe0, oe1)
    sol_b, score_b, _ = dismantle_greedy_banded(
        params, banded, env, variant="unit_cost", precise=True, step=4
    )
    assert sol_d == sol_b
    np.testing.assert_allclose(score_d, score_b, rtol=1e-5)


def test_batch_env_dismantle_within_bias_bound():
    """batch_env=True (ONE cascade per StepRatio batch — the 10^6-node
    protocol) must track the sequential loop within the documented
    step/n AUDC bound and remove a near-identical node set."""
    from mdcommunity_tpu.env.host_env import make_host_env
    from mdcommunity_tpu.eval.metrics import dismantle_greedy_banded

    rng = np.random.default_rng(7)
    n = 1024
    layers = []
    for _ in range(2):
        e = n * 3
        src = rng.integers(0, n, e)
        off = np.minimum(
            (8.0 * (rng.pareto(2.5, e) + 1.0)).astype(np.int64), n // 2 - 1
        ) * rng.choice(np.array([-1, 1]), e)
        dst = (src + off) % n
        keep = src != dst
        layers.append(np.stack([src[keep], dst[keep]], 1))
    e0, e1 = layers
    params = init_params(jax.random.PRNGKey(0))
    step = 32

    def run(batch_env):
        banded, _, (oe0, oe1) = build_banded_duplex(
            n, e0, e1, S=128, B=128, max_rank=n
        )
        env = make_host_env(n, oe0, oe1)
        return dismantle_greedy_banded(
            params, banded, env, step=step, batch_env=batch_env
        )

    sol_seq, score_seq, _ = run(False)
    sol_bat, score_bat, _ = run(True)
    assert len(sol_bat) > 0
    # batched score may only undershoot, by at most step/n (+ a small
    # terminal-overshoot allowance on the pessimistic side)
    assert score_bat <= score_seq + step / n
    assert score_seq - score_bat <= step / n + 1e-9
    # same prefix while the q trajectory agrees
    prefix = min(16, len(sol_seq), len(sol_bat))
    assert sol_seq[:prefix] == sol_bat[:prefix]


def test_fused_step_trajectory_matches_unfused():
    """The StepRatio-0 fused per-removal step (ONE jit: severs + cover +
    forward + top-1, eval/metrics._make_fused_step) must walk the exact
    trajectory of the unfused per-removal loop on the XLA engine — any
    state-update bug in the fused path (sever masking, covered update,
    action extraction) shows up as divergence here.  (On TPU the packed
    engine's fused compile can reassociate f32 sums and flip near-ties —
    that drift is quantified and bounded by scripts/probe_fused_drift.py;
    this test pins the structural contract where compiles are
    deterministic.)"""
    from mdcommunity_tpu.eval.metrics import dismantle_greedy_banded

    rng = np.random.default_rng(7)
    n = 1024
    layers = []
    for _ in range(2):
        e = n * 3
        src = rng.integers(0, n, e)
        off = np.minimum(
            (8.0 * (rng.pareto(2.5, e) + 1.0)).astype(np.int64), n // 2 - 1
        ) * rng.choice(np.array([-1, 1]), e)
        dst = (src + off) % n
        keep = src != dst
        layers.append(np.stack([src[keep], dst[keep]], 1))
    params = init_params(jax.random.PRNGKey(0))

    def run(batch_env):
        banded, _, (oe0, oe1) = build_banded_duplex(
            n, layers[0], layers[1], S=128, B=128, max_rank=n
        )
        env = make_host_env(n, oe0, oe1)
        return dismantle_greedy_banded(
            params, banded, env, step=1, batch_env=batch_env,
            max_steps=150, precise=True,
        )

    sol_f, score_f, _ = run(False)   # fused single-jit path
    sol_u, score_u, _ = run(True)    # generic per-removal path
    assert sol_f == sol_u
    assert abs(score_f - score_u) < 1e-12
