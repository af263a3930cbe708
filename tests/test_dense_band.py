"""Block-banded dense SpMM (ops/dense_band.py) vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcommunity_tpu.ops.dense_band import (
    build_dense_band,
    live_scales,
    sever_edges,
    spmm_dense_band,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _sym_graph(rng, n, e, spread, n_far):
    src = rng.integers(0, n, e)
    dst = np.clip(src + rng.integers(-spread, spread + 1, e), 0, n - 1)
    if n_far:
        src = np.concatenate([src, rng.integers(0, n, n_far)])
        dst = np.concatenate([dst, rng.integers(0, n, n_far)])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    return np.concatenate([src, dst]), np.concatenate([dst, src])


def _dense_a(src, dst, n, w=None):
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (dst, src), 1.0 if w is None else w)
    return a


def test_forward_matches_dense(rng):
    src, dst = _sym_graph(rng, 300, 900, 40, 25)
    dbg = build_dense_band(src, dst, None, 300, S=128, B=64, dtype=jnp.float32)
    h = rng.standard_normal((dbg.pad_n, 16)).astype(np.float32)
    row = jnp.ones((dbg.pad_n,), jnp.float32)
    out = spmm_dense_band(dbg, row, row, jnp.asarray(h), precise=True)
    ref = _dense_a(src, dst, dbg.pad_n) @ h.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_masked_forward_and_grad(rng):
    src, dst = _sym_graph(rng, 260, 700, 30, 15)
    dbg = build_dense_band(src, dst, None, 260, S=128, B=64, dtype=jnp.float32)
    covered = np.zeros(dbg.pad_n, bool)
    covered[dbg.n :] = True
    covered[rng.choice(dbg.n, 30, replace=False)] = True
    row, col = live_scales(dbg, jnp.asarray(covered), "sum")
    h = rng.standard_normal((dbg.pad_n, 8)).astype(np.float32)
    gcot = rng.standard_normal((dbg.pad_n, 8)).astype(np.float32)

    a = _dense_a(src, dst, dbg.pad_n)
    live = (~covered).astype(np.float64)
    a_eff = a * np.outer(live, live)

    out = spmm_dense_band(dbg, row, col, jnp.asarray(h), precise=True)
    np.testing.assert_allclose(
        np.asarray(out), a_eff @ h.astype(np.float64), rtol=1e-4, atol=1e-4
    )

    def loss(h):
        return jnp.vdot(spmm_dense_band(dbg, row, col, h, precise=True), jnp.asarray(gcot))

    dh = jax.grad(loss)(jnp.asarray(h))
    np.testing.assert_allclose(
        np.asarray(dh), a_eff.T @ gcot.astype(np.float64), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("agg", ["mean", "gcn"])
def test_aggregator_scales(rng, agg):
    src, dst = _sym_graph(rng, 200, 500, 25, 10)
    dbg = build_dense_band(src, dst, None, 200, S=128, B=64, dtype=jnp.float32)
    covered = np.zeros(dbg.pad_n, bool)
    covered[dbg.n :] = True
    covered[rng.choice(dbg.n, 20, replace=False)] = True
    row, col = live_scales(dbg, jnp.asarray(covered), agg)
    h = rng.standard_normal((dbg.pad_n, 4)).astype(np.float32)
    out = np.asarray(spmm_dense_band(dbg, row, col, jnp.asarray(h), precise=True))

    a = _dense_a(src, dst, dbg.pad_n)
    live = (~covered).astype(np.float64)
    a_eff = a * np.outer(live, live)
    deg = a_eff.sum(1)
    safe = np.maximum(deg, 1.0)
    if agg == "mean":
        ref = (a_eff / safe[:, None]) @ h.astype(np.float64)
    else:
        s = live / np.sqrt(safe)
        ref = (a_eff * np.outer(s, s) / np.outer(live, live).clip(1e-9)) @ h
        # gcn: a * s_dst * s_src with s already including liveness
        a_gcn = a * np.outer(s, s)
        ref = a_gcn @ h.astype(np.float64)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_asymmetric_scale_grad(rng):
    """dh must transpose the rank-1 scaling (mean aggregator)."""
    src, dst = _sym_graph(rng, 150, 400, 20, 8)
    dbg = build_dense_band(src, dst, None, 150, S=128, B=64, dtype=jnp.float32)
    covered = np.zeros(dbg.pad_n, bool)
    covered[dbg.n :] = True
    row, col = live_scales(dbg, jnp.asarray(covered), "mean")
    h = rng.standard_normal((dbg.pad_n, 4)).astype(np.float32)
    gcot = rng.standard_normal((dbg.pad_n, 4)).astype(np.float32)

    def loss(h):
        return jnp.vdot(spmm_dense_band(dbg, row, col, h, precise=True), jnp.asarray(gcot))

    dh = jax.grad(loss)(jnp.asarray(h))

    a = _dense_a(src, dst, dbg.pad_n)
    live = (~covered).astype(np.float64)
    a_eff = a * np.outer(live, live)
    a_mean = a_eff / np.maximum(a_eff.sum(1), 1.0)[:, None]
    np.testing.assert_allclose(
        np.asarray(dh), a_mean.T @ gcot.astype(np.float64), rtol=1e-4, atol=1e-4
    )


def test_circular_seam_edges_in_band(rng):
    """Ring-ordered graphs: edges across the index seam (src near n-1, dst
    near 0) stay in-band via the circular window — zero overflow — and both
    forward and grad match the dense oracle."""
    n, S, B = 256, 128, 64  # n % S == 0 so the ring has no dead seam rows
    u = np.arange(n)
    ring1 = (u, (u + 1) % n)
    ring7 = (u, (u + 7) % n)
    seam = (np.array([n - 3, n - 1, n - 2]), np.array([2, 0, 5]))
    src = np.concatenate([ring1[0], ring7[0], seam[0]])
    dst = np.concatenate([ring1[1], ring7[1], seam[1]])
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    dbg = build_dense_band(ssym, dsym, None, n, S=S, B=B, dtype=jnp.float32)
    assert int(dbg.ccoo.d_src.shape[0]) == 0
    assert int(dbg.spill.d_src.shape[0]) == 0

    h = rng.standard_normal((dbg.pad_n, 8)).astype(np.float32)
    gcot = rng.standard_normal((dbg.pad_n, 8)).astype(np.float32)
    ones = jnp.ones((dbg.pad_n,), jnp.float32)
    out = spmm_dense_band(dbg, ones, ones, jnp.asarray(h), precise=True)
    ref = _dense_a(ssym, dsym, dbg.pad_n) @ h.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def loss(h):
        return jnp.vdot(
            spmm_dense_band(dbg, ones, ones, h, precise=True), jnp.asarray(gcot)
        )

    dh = jax.grad(loss)(jnp.asarray(h))
    np.testing.assert_allclose(
        np.asarray(dh),
        _dense_a(ssym, dsym, dbg.pad_n).T @ gcot.astype(np.float64),
        rtol=1e-4, atol=1e-4,
    )


def test_sever_overflow_and_band_edges(rng):
    """sever_edges zeroes both band-stored and overflow-stored edges under
    the circular symmetric classification."""
    src, dst = _sym_graph(rng, 260, 700, 30, 15)
    dbg = build_dense_band(src, dst, None, 260, S=128, B=64, dtype=jnp.float32)
    assert int(dbg.ccoo.d_src.shape[0]) > 0
    # sever one overflow (mirror-lane) edge and one band edge, both directions
    ov_s = int(np.asarray(dbg.c_usrc)[0])
    ov_d = int(np.asarray(dbg.c_udst)[0])
    band_idx = np.argmax(np.abs(src - dst) <= 8)
    b_s, b_d = int(src[band_idx]), int(dst[band_idx])
    sev_src = jnp.asarray([ov_s, ov_d, b_s, b_d], jnp.int32)
    sev_dst = jnp.asarray([ov_d, ov_s, b_d, b_s], jnp.int32)
    dbg2 = sever_edges(dbg, sev_src, sev_dst, jnp.ones(4, bool))

    h = rng.standard_normal((dbg.pad_n, 4)).astype(np.float32)
    ones = jnp.ones((dbg.pad_n,), jnp.float32)
    out = np.asarray(spmm_dense_band(dbg2, ones, ones, jnp.asarray(h), precise=True))
    a = _dense_a(src, dst, dbg.pad_n)
    for s, d in [(ov_s, ov_d), (ov_d, ov_s), (b_s, b_d), (b_d, b_s)]:
        a[d, s] = 0.0
    np.testing.assert_allclose(out, a @ h.astype(np.float64), rtol=1e-4, atol=1e-4)


def test_mirror_spill_path(rng):
    """Blocks with more touched rows than mirror lanes spill to the legacy
    full-table COO; results still match the dense oracle (fwd + grad)."""
    src, dst = _sym_graph(rng, 260, 500, 20, 60)
    dbg = build_dense_band(
        src, dst, None, 260, S=128, B=64, dtype=jnp.float32, max_mirror=2
    )
    assert int(dbg.spill.d_src.shape[0]) > 0
    assert int(dbg.ccoo.d_src.shape[0]) > 0
    h = rng.standard_normal((dbg.pad_n, 8)).astype(np.float32)
    gcot = rng.standard_normal((dbg.pad_n, 8)).astype(np.float32)
    ones = jnp.ones((dbg.pad_n,), jnp.float32)
    out = spmm_dense_band(dbg, ones, ones, jnp.asarray(h), precise=True)
    a = _dense_a(src, dst, dbg.pad_n)
    np.testing.assert_allclose(
        np.asarray(out), a @ h.astype(np.float64), rtol=1e-4, atol=1e-4
    )

    def loss(h):
        return jnp.vdot(
            spmm_dense_band(dbg, ones, ones, h, precise=True), jnp.asarray(gcot)
        )

    dh = jax.grad(loss)(jnp.asarray(h))
    np.testing.assert_allclose(
        np.asarray(dh), a.T @ gcot.astype(np.float64), rtol=1e-4, atol=1e-4
    )
