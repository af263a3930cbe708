"""Packed-layout banded model forward (models/net_packed.py) vs the XLA
dense-band forward (models/net.py banded_test_forward) — full Q(s, ·) parity,
sever consistency, and a packed end-to-end rollout smoke.

Interpret mode on CPU (the kernel's Mosaic lowering is chip-validated by
scripts/bench_band_packed.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mdcommunity_tpu.graphs.banded import (  # noqa: E402
    apply_severs,
    apply_severs_packed,
    build_banded_duplex,
    pack_duplex,
)
from mdcommunity_tpu.models.net import banded_test_forward, init_params  # noqa: E402
from mdcommunity_tpu.models.net_packed import banded_test_forward_packed  # noqa: E402


def _local_edges(rng, n, e, scale=16.0):
    src = rng.integers(0, n, e)
    off = np.minimum(
        (scale * (rng.pareto(2.0, e) + 1)).astype(np.int64), n // 2 - 1
    )
    dst = (src + off * rng.choice([-1, 1], e)) % n
    keep = src != dst
    return np.stack([src[keep], dst[keep]], 1)


def _small_banded(rng, n=700, e=1400):
    e0 = _local_edges(rng, n, e)
    e1 = _local_edges(rng, n, e)
    banded, _, ordered = build_banded_duplex(
        n, e0, e1, S=256, B=128, reorder=False
    )
    return banded, ordered


def _q_close(q_pk, q_ref, tol=2e-2):
    q_pk, q_ref = np.asarray(q_pk), np.asarray(q_ref)
    act = np.isfinite(q_ref)
    np.testing.assert_array_equal(np.isfinite(q_pk), act)
    scale = np.abs(q_ref[act]).max()
    np.testing.assert_allclose(
        q_pk[act], q_ref[act], rtol=tol, atol=tol * scale
    )


@pytest.mark.parametrize("variant", ["unit_cost", "degree_cost"])
def test_packed_forward_matches_dense(rng, variant):
    banded, _ = _small_banded(rng)
    pks = pack_duplex(banded)
    params = init_params(jax.random.PRNGKey(0))
    covered = jnp.asarray(
        (rng.random(banded.pad_n) < 0.1) | ~np.asarray(banded.node_mask)
    )
    q_ref = banded_test_forward(
        params, banded, covered, variant=variant, precise=True
    )
    q_pk = banded_test_forward_packed(
        params, banded, pks, covered, variant=variant, interpret=True
    )
    _q_close(q_pk, q_ref)


def test_packed_forward_bf16_activations(rng):
    banded, _ = _small_banded(rng)
    pks = pack_duplex(banded)
    params = init_params(jax.random.PRNGKey(1))
    covered = jnp.asarray(~np.asarray(banded.node_mask))
    q_ref = banded_test_forward(params, banded, covered, precise=True)
    q_pk = banded_test_forward_packed(
        params, banded, pks, covered, act_dtype=jnp.bfloat16, interpret=True
    )
    _q_close(q_pk, q_ref, tol=5e-2)


@pytest.mark.parametrize("act_dtype", ["float32", "bfloat16"])
def test_packed_forward_fused_sage(rng, act_dtype):
    """fuse_sage=True (aggregation + merged dense layer + relu + l2n in one
    kernel pass) == the XLA dense-band forward, within bf16-dot rounding
    (the fused path pre-merges W1@W3 / W2@W3 in f32, so intermediate
    rounding differs from the two-matmul unfused order)."""
    dt = jnp.float32 if act_dtype == "float32" else jnp.bfloat16
    banded, _ = _small_banded(rng)
    pks = pack_duplex(banded)
    params = init_params(jax.random.PRNGKey(0))
    covered = jnp.asarray(
        (rng.random(banded.pad_n) < 0.1) | ~np.asarray(banded.node_mask)
    )
    q_ref = banded_test_forward(params, banded, covered, precise=True)
    q_fused = banded_test_forward_packed(
        params, banded, pks, covered, act_dtype=dt, interpret=True,
        fuse_sage=True,
    )
    _q_close(q_fused, q_ref, tol=5e-2 if act_dtype == "bfloat16" else 2e-2)


def test_packed_sever_consistency(rng):
    """apply_severs_packed keeps forwards equal after band + overflow severs."""
    banded, ordered = _small_banded(rng)
    pks = pack_duplex(banded)
    params = init_params(jax.random.PRNGKey(2))
    covered = jnp.asarray(~np.asarray(banded.node_mask))

    for layer in range(2):
        ns = ordered[layer][
            rng.choice(len(ordered[layer]), 8, replace=False)
        ]
        s = jnp.asarray(ns[:, 0].astype(np.int32))
        d = jnp.asarray(ns[:, 1].astype(np.int32))
        v = jnp.ones((8,), bool)
        banded_ref = apply_severs(banded, layer, s, d, v)
        banded, pks = apply_severs_packed(banded, pks, layer, s, d, v)
        np.testing.assert_array_equal(
            np.asarray(banded.dbg(layer).base),
            np.asarray(banded_ref.dbg(layer).base),
        )

    q_ref = banded_test_forward(params, banded, covered, precise=True)
    q_pk = banded_test_forward_packed(
        params, banded, pks, covered, interpret=True
    )
    _q_close(q_pk, q_ref)


def test_packed_rollout_smoke(rng):
    """dismantle_greedy_banded(packed=True) terminates with a valid solution
    and a score close to the dense-engine rollout."""
    from mdcommunity_tpu.env.host_env import make_host_env
    from mdcommunity_tpu.eval.metrics import dismantle_greedy_banded

    banded, ordered = _small_banded(rng, n=520, e=900)
    params = init_params(jax.random.PRNGKey(3))
    n = int(banded.n_nodes)

    env1 = make_host_env(n, ordered[0], ordered[1])
    sol_ref, score_ref, _ = dismantle_greedy_banded(
        params, banded, env1, max_steps=40
    )
    env2 = make_host_env(n, ordered[0], ordered[1])
    sol_pk, score_pk, _ = dismantle_greedy_banded(
        params, banded, env2, max_steps=40, packed=True
    )
    assert len(sol_pk) > 0
    assert all(0 <= v < n for v in sol_pk)
    # bf16-dot rounding can reorder near-tie argmaxes; scores stay close
    assert abs(score_pk - score_ref) < 0.15 * max(score_ref, 0.05), (
        score_pk,
        score_ref,
    )


def test_packed_forward_ce_prior_channel(rng):
    """CE variant through the banded/packed path: the 3rd input channel
    (community prior, graphs/community.py) flows through both engines
    identically (round-2: CE is now allowed through the blocked real-data
    path, eval/real.py)."""
    n = 700
    banded, _ = _small_banded(rng, n=n)
    import dataclasses

    import jax.numpy as jnp

    nf = np.zeros((2, banded.pad_n), np.float32)
    nf[:, :n] = rng.random((2, n)).astype(np.float32)
    banded = dataclasses.replace(banded, node_feat=jnp.asarray(nf))
    pks = pack_duplex(banded)
    params = init_params(jax.random.PRNGKey(4), node_feat_dim=3)
    covered = jnp.asarray(
        (rng.random(banded.pad_n) < 0.1) | ~np.asarray(banded.node_mask)
    )
    q_ref = banded_test_forward(
        params, banded, covered, variant="ce", precise=True
    )
    q_pk = banded_test_forward_packed(
        params, banded, pks, covered, variant="ce", interpret=True
    )
    _q_close(q_pk, q_ref)
    # the prior channel actually matters: zeroing it changes Q
    banded0 = dataclasses.replace(
        banded, node_feat=jnp.zeros_like(banded.node_feat)
    )
    q0 = banded_test_forward(params, banded0, covered, variant="ce",
                             precise=True)
    act = np.isfinite(np.asarray(q_ref))
    assert not np.allclose(np.asarray(q_ref)[act], np.asarray(q0)[act])
