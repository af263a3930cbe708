"""Blocked Pallas SpMM/SDDMM kernels vs dense references (interpret mode on CPU;
the TPU-hardware path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcommunity_tpu.ops.pallas_spmm import (
    build_block_coo,
    sddmm_block,
    spmm_block,
)


@pytest.fixture(scope="module")
def problem():
    N, E, D, S, T = 2048, 8192, 64, 512, 1024
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    bcoo, ssrc, sdst, smask = build_block_coo(src, dst, N, S, T)
    w = rng.random(bcoo.n_slots).astype(np.float32) * smask
    h = rng.standard_normal((bcoo.n_blocks * S, D)).astype(np.float32)
    return bcoo, ssrc, sdst, smask, w, h


def test_layout_roundtrip(problem):
    bcoo, ssrc, sdst, smask, w, h = problem
    # every real slot's local ids reconstruct the global ids
    ls = np.asarray(bcoo.lsrc).reshape(-1)
    ld = np.asarray(bcoo.ldst).reshape(-1)
    sb = np.repeat(np.asarray(bcoo.src_blk), bcoo.T)
    db = np.repeat(np.asarray(bcoo.dst_blk), bcoo.T)
    np.testing.assert_array_equal((sb * bcoo.S + ls)[smask], ssrc[smask])
    np.testing.assert_array_equal((db * bcoo.S + ld)[smask], sdst[smask])
    assert bcoo.n_pairs % 8 == 0


def test_spmm_forward(problem):
    bcoo, ssrc, sdst, smask, w, h = problem
    out = np.asarray(
        spmm_block(bcoo, jnp.asarray(w.reshape(bcoo.n_pairs, bcoo.T)),
                   jnp.asarray(h), interpret=True)
    )
    ref = np.zeros_like(h)
    np.add.at(ref, sdst[smask], h[ssrc[smask]] * w[smask][:, None])
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_sddmm(problem):
    bcoo, ssrc, sdst, smask, w, h = problem
    rng = np.random.default_rng(1)
    g = rng.standard_normal(h.shape).astype(np.float32)
    dw = np.asarray(
        sddmm_block(bcoo, jnp.asarray(h), jnp.asarray(g), interpret=True)
    ).reshape(-1)
    ref = np.sum(h[ssrc] * g[sdst], axis=1)
    np.testing.assert_allclose(dw[smask], ref[smask], atol=1e-2)


def test_vjp_symmetric(problem):
    """Gradients through spmm() match the segment-sum reference when the
    adjacency is symmetric (both orientations, equal weights)."""
    N, S, T = 1024, 512, 1024
    rng = np.random.default_rng(2)
    und = np.unique(
        np.sort(rng.integers(0, N, (1500, 2)).astype(np.int32), axis=1), axis=0
    )
    und = und[und[:, 0] != und[:, 1]]
    s2 = np.concatenate([und[:, 0], und[:, 1]])
    d2 = np.concatenate([und[:, 1], und[:, 0]])
    bcoo, qs, qd, qm = build_block_coo(s2, d2, N, S, T)
    uw = rng.random(len(und)).astype(np.float32)
    wmap = {}
    for i, (a, b) in enumerate(und):
        wmap[(a, b)] = uw[i]
        wmap[(b, a)] = uw[i]
    w = np.zeros(bcoo.n_slots, np.float32)
    for sl in np.nonzero(qm)[0]:
        w[sl] = wmap[(int(qs[sl]), int(qd[sl]))]
    h = rng.standard_normal((bcoo.n_blocks * S, 64)).astype(np.float32)
    wj = jnp.asarray(w.reshape(bcoo.n_pairs, T))
    hj = jnp.asarray(h)

    from mdcommunity_tpu.ops import pallas_spmm as PS

    out = PS.spmm_block(bcoo, wj, hj, interpret=True)
    grad_out = 2 * out
    dh = PS.spmm_block(bcoo, wj, grad_out, interpret=True)
    dw = PS.sddmm_block(bcoo, hj, grad_out, interpret=True)

    def loss_ref(w_, h_):
        msg = h_[qs] * w_.reshape(-1)[:, None]
        o = jnp.zeros_like(h_).at[qd].add(msg)
        return jnp.sum(o ** 2)

    gw, gh = jax.grad(loss_ref, argnums=(0, 1))(wj, hj)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(gh), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(dw).reshape(-1)[qm], np.asarray(gw).reshape(-1)[qm], atol=2e-2
    )


def test_spmm_small_T_and_odd_dim():
    """T=512 layout (lane-width granularity) and D not a multiple of 64."""
    N, E, D, S, T = 1024, 4096, 48, 512, 512
    rng = np.random.default_rng(3)
    src = rng.integers(0, N, E).astype(np.int32)
    dst = rng.integers(0, N, E).astype(np.int32)
    bcoo, ssrc, sdst, smask = build_block_coo(src, dst, N, S, T)
    assert bcoo.T == 512
    w = rng.random(bcoo.n_slots).astype(np.float32) * smask
    h = rng.standard_normal((bcoo.n_blocks * S, D)).astype(np.float32)
    out = np.asarray(
        spmm_block(bcoo, jnp.asarray(w.reshape(bcoo.n_pairs, T)),
                   jnp.asarray(h), interpret=True)
    )
    ref = np.zeros_like(h)
    np.add.at(ref, sdst[smask], h[ssrc[smask]] * w[smask][:, None])
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_rcm_ordering_improves_fill():
    from mdcommunity_tpu.graphs.ordering import apply_order, bandwidth, rcm_order

    rng = np.random.default_rng(4)
    n = 4096
    scramble = rng.permutation(n)
    u = np.arange(n)
    ring_s, ring_d = scramble[u], scramble[(u + 1) % n]
    assert bandwidth(ring_s, ring_d) > 512
    perm = rcm_order([ring_s], [ring_d], n)
    s2, d2 = apply_order(perm, ring_s, ring_d)
    assert bandwidth(s2, d2) <= 8
    b1, *_ = build_block_coo(ring_s, ring_d, n, 512, 512)
    b2, *_ = build_block_coo(s2, d2, n, 512, 512)
    assert b2.n_pairs < b1.n_pairs  # fewer pair chunks = higher fill
