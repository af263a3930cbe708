"""Banded SpMM (ops/band_spmm.py) vs dense reference, including VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcommunity_tpu.ops.band_spmm import (
    BandGraph,
    band_live_mask,
    band_weights,
    build_band,
    spmm_band,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _random_graph(rng, n, e, spread, n_far=0):
    """Directed edges mostly within +-spread of the diagonal, plus n_far
    uniform long-range edges (overflow path)."""
    src = rng.integers(0, n, e)
    off = rng.integers(-spread, spread + 1, e)
    dst = np.clip(src + off, 0, n - 1)
    if n_far:
        fs = rng.integers(0, n, n_far)
        fd = rng.integers(0, n, n_far)
        src = np.concatenate([src, fs])
        dst = np.concatenate([dst, fd])
    return src.astype(np.int64), dst.astype(np.int64)


def _dense_ref(src, dst, w, n, h):
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (dst, src), w)
    return a @ np.asarray(h, np.float64)


def _setup(rng, n=300, e=1500, spread=40, n_far=30, S=128, B=64, d=16):
    src, dst = _random_graph(rng, n, e, spread, n_far)
    w = rng.random(len(src)).astype(np.float32)
    bg, slot_row, slot_col, in_band = build_band(src, dst, n, S=S, B=B)
    wb = band_weights(bg, slot_row, slot_col, w[in_band])
    # overflow weights must be in destination-sorted order (SortedCOO forward
    # order): build_sorted_coo sorted the out-of-band edges by dst
    ov_w = w[~in_band]
    order = np.argsort(dst[~in_band], kind="stable")
    w_ov = ov_w[order].astype(np.float32)
    h = rng.standard_normal((bg.pad_n, d)).astype(np.float32)
    return src, dst, w, bg, wb, w_ov, h


def test_forward_matches_dense(rng):
    src, dst, w, bg, wb, w_ov, h = _setup(rng)
    out = spmm_band(bg, jnp.asarray(wb), jnp.asarray(w_ov), jnp.asarray(h))
    ref = _dense_ref(src, dst, w, bg.pad_n, h)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_forward_no_overflow(rng):
    src, dst, w, bg, wb, w_ov, h = _setup(rng, n_far=0)
    assert bg.overflow.d_src.shape[0] == 0
    out = spmm_band(bg, jnp.asarray(wb), jnp.zeros((0,), jnp.float32), jnp.asarray(h))
    ref = _dense_ref(src, dst, w, bg.pad_n, h)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_vjp_matches_dense_autodiff(rng):
    # symmetric graph (both orientations, equal weights) as the VJP assumes
    src, dst = _random_graph(rng, 200, 800, 30, 20)
    w0 = rng.random(len(src)).astype(np.float32)
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    wsym = np.concatenate([w0, w0])
    bg, slot_row, slot_col, in_band = build_band(ssym, dsym, 200, S=128, B=64)
    wb = band_weights(bg, slot_row, slot_col, wsym[in_band])
    order = np.argsort(dsym[~in_band], kind="stable")
    w_ov = wsym[~in_band][order].astype(np.float32)
    h = rng.standard_normal((bg.pad_n, 8)).astype(np.float32)
    gcot = rng.standard_normal((bg.pad_n, 8)).astype(np.float32)

    def loss(wb, w_ov, h):
        return jnp.vdot(spmm_band(bg, wb, w_ov, h), jnp.asarray(gcot))

    dwb, dw_ov, dh = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(wb), jnp.asarray(w_ov), jnp.asarray(h)
    )

    # dense reference gradient: loss = g . (A h); dh = A^T g; dA = g h^T
    a = np.zeros((bg.pad_n, bg.pad_n), np.float64)
    np.add.at(a, (dsym, ssym), wsym)
    np.testing.assert_allclose(
        np.asarray(dh), a.T @ gcot.astype(np.float64), rtol=1e-3, atol=1e-3
    )
    dA = gcot.astype(np.float64) @ h.astype(np.float64).T  # [dst, src] layout
    # band slot (v, k) corresponds to A[v, v+k-B]
    rows = np.asarray(slot_row)
    cols_node = rows + np.asarray(slot_col) - bg.B
    np.testing.assert_allclose(
        np.asarray(dwb)[rows, np.asarray(slot_col)],
        dA[rows, cols_node],
        rtol=1e-3,
        atol=1e-3,
    )
    # overflow slots: dw_e = h[src_e] . g[dst_e] in destination-sorted order
    ov = bg.overflow
    ref_dw_ov = np.sum(
        h[np.asarray(ov.d_src)] * gcot[np.asarray(ov.d_dst)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(dw_ov), ref_dw_ov, rtol=1e-3, atol=1e-3)


def test_band_live_mask(rng):
    bg, _, _, _ = build_band(np.array([0]), np.array([1]), 250, S=128, B=64)
    covered = np.zeros(bg.pad_n, bool)
    covered[bg.n :] = True  # padding rows
    covered[[3, 77, 130]] = True
    live = np.asarray(band_live_mask(bg, jnp.asarray(covered)))
    for v in [0, 3, 50, 129, 200]:
        for k in [0, 1, 64, 100, 128]:
            u = v + k - bg.B
            expect = 0.0
            if 0 <= u < bg.pad_n and not covered[v] and not covered[u]:
                expect = 1.0
            assert live[v, k] == expect, (v, k)


def test_duplicate_edges_accumulate(rng):
    src = np.array([2, 2, 5])
    dst = np.array([3, 3, 5])
    w = np.array([1.0, 2.0, 4.0], np.float32)
    bg, r, c, ib = build_band(src, dst, 10, S=128, B=64)
    wb = band_weights(bg, r, c, w)
    h = np.zeros((bg.pad_n, 2), np.float32)
    h[2] = [1.0, 1.0]
    h[5] = [1.0, -1.0]
    out = np.asarray(
        spmm_band(bg, jnp.asarray(wb), jnp.zeros((0,), jnp.float32), jnp.asarray(h))
    )
    np.testing.assert_allclose(out[3], [3.0, 3.0])
    np.testing.assert_allclose(out[5], [4.0, -4.0])
