"""Packed Pallas band kernel (ops/band_pallas.py) vs the XLA dense-band
engine (ops/dense_band.py) — full operator (band + mirror + spill + rank-1
scales), forward and VJP.

Interpret mode on CPU; the real-chip Mosaic lowering is validated separately
(scripts/proto_band_pallas.py on the TPU, per .claude/skills/verify)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from mdcommunity_tpu.ops.band_pallas import (  # noqa: E402
    pack_band,
    pack_rows,
    spmm_band_packed,
    unpack_rows,
)
from mdcommunity_tpu.ops.dense_band import (  # noqa: E402
    build_dense_band,
    live_scales,
    spmm_dense_band,
)


def _ring_graph(rng, n, e, scale=24.0):
    src = rng.integers(0, n, e)
    off = np.minimum(
        (scale * (rng.pareto(2.0, e) + 1)).astype(np.int64), n // 2 - 1
    )
    dst = (src + off * rng.choice([-1, 1], e)) % n
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    return ssym, dsym


@pytest.mark.parametrize("agg", ["sum", "mean"])
@pytest.mark.parametrize("G", [8, 2])
def test_packed_matches_dense_band(rng, agg, G):
    # G=8 -> n_prog=1 (wrap-only 3-piece h DMA); G=2 -> n_prog=4, exercising
    # the middle programs' single contiguous h-window DMA
    n, e = 4096, 8192
    ssym, dsym = _ring_graph(rng, n, e)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    assert dbg.ccoo.d_src.shape[0] > 0, "want mirror-lane coverage"
    pk = pack_band(dbg, G=G)

    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.15)
    row, col = live_scales(dbg, covered, agg)
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))

    ref = spmm_dense_band(dbg, row, col, h, precise=True)
    out = unpack_rows(
        spmm_band_packed(pk, dbg, row, col, pack_rows(h), True)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()),
    )


def test_packed_vjp_matches(rng):
    n, e = 2048, 4096
    ssym, dsym = _ring_graph(rng, n, e)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    pk = pack_band(dbg)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))

    g_ref = jax.grad(
        lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x, True)))
    )(h)
    g_pk = jax.grad(
        lambda x2: jnp.sum(
            jnp.square(spmm_band_packed(pk, dbg, row, col, x2, True))
        )
    )(pack_rows(h))
    np.testing.assert_allclose(
        np.asarray(unpack_rows(g_pk)), np.asarray(g_ref),
        rtol=3e-2, atol=3e-2 * float(jnp.abs(g_ref).max()),
    )


def test_packed_bf16_storage(rng):
    """bf16 h2/out storage (halved activation HBM traffic; f32 accumulation
    in the dots) stays within bf16 rounding of the f32 engine."""
    n, e = 4096, 8192
    ssym, dsym = _ring_graph(rng, n, e)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    pk = pack_band(dbg, G=2)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.15)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    ref = spmm_dense_band(dbg, row, col, h, precise=True)
    h2b = pack_rows(h).astype(jnp.bfloat16)
    out = spmm_band_packed(pk, dbg, row, col, h2b, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(unpack_rows(out)).astype(np.float32), np.asarray(ref),
        rtol=5e-2, atol=5e-2 * float(jnp.abs(ref).max()),
    )
    g2 = jax.grad(
        lambda x2: jnp.sum(
            jnp.square(spmm_band_packed(pk, dbg, row, col, x2, True).astype(jnp.float32))
        )
    )(h2b)
    g_ref = jax.grad(
        lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x, True)))
    )(h)
    np.testing.assert_allclose(
        np.asarray(unpack_rows(g2)).astype(np.float32), np.asarray(g_ref),
        rtol=8e-2, atol=8e-2 * float(jnp.abs(g_ref).max()),
    )


def test_pack_roundtrip(rng):
    h = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_rows(pack_rows(h))), h)


@pytest.mark.parametrize("G", [8, 2])
def test_nibble_packed_matches_dense_band(rng, G):
    """nibble=True (two window columns per byte, in-kernel div/mod unpack)
    — forward + VJP vs the f32 XLA engine, and sever consistency incl. two
    severs landing in the SAME byte (adjacent even/odd window columns),
    which the additive nibble-clear scatter must compose."""
    from mdcommunity_tpu.ops.band_pallas import sever_edges_packed

    n, e = 4096, 8192
    ssym, dsym = _ring_graph(rng, n, e)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    assert dbg.ccoo.d_src.shape[0] > 0, "want mirror-lane coverage"
    pk = pack_band(dbg, G=G, nibble=True)
    assert pk.nibble and pk.base_pk.shape[-1] == pk.W2 // 2

    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.15)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))

    ref = spmm_dense_band(dbg, row, col, h, precise=True)
    out = unpack_rows(spmm_band_packed(pk, dbg, row, col, pack_rows(h), True))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()),
    )
    g_ref = jax.grad(
        lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x, True)))
    )(h)
    g_pk = jax.grad(
        lambda x2: jnp.sum(
            jnp.square(spmm_band_packed(pk, dbg, row, col, x2, True))
        )
    )(pack_rows(h))
    np.testing.assert_allclose(
        np.asarray(unpack_rows(g_pk)), np.asarray(g_ref),
        rtol=3e-2, atol=3e-2 * float(jnp.abs(g_ref).max()),
    )

    # severs: unique directed edges (the env's contract), including a
    # handcrafted same-byte pair — node u -> u+1 and u+2 -> u+1 share the
    # destination row and adjacent window columns u, u+2?  Adjacent EVEN/ODD
    # window columns are (src=2k, src=2k+1): sever (a, d) and (a+1, d).
    from mdcommunity_tpu.ops.dense_band import sever_edges

    d0 = int(dsym[0])
    a_even = (int(ssym[0]) // 2) * 2
    pairs = {(int(s), int(d)) for s, d in zip(ssym[:24], dsym[:24])}
    pairs |= {(a_even, d0), (a_even + 1, d0)}
    sev_s = jnp.asarray(np.asarray([p[0] for p in pairs], np.int32))
    sev_d = jnp.asarray(np.asarray([p[1] for p in pairs], np.int32))
    valid = jnp.ones((len(pairs),), bool)
    pk2, dbg2 = sever_edges_packed(pk, dbg, sev_s, sev_d, valid)
    dbg_ref = sever_edges(dbg, sev_s, sev_d, valid)
    np.testing.assert_array_equal(
        np.asarray(dbg2.base), np.asarray(dbg_ref.base)
    )
    ref2 = spmm_dense_band(dbg_ref, row, col, h, precise=True)
    out2 = unpack_rows(
        spmm_band_packed(pk2, dbg2, row, col, pack_rows(h), True)
    )
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref2),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(ref2).max()),
    )


def test_packed_pure_band_no_mirror(rng):
    """All edges in-band (dbg.ccoo empty) — covers the Cp==0 kernel branch
    (different argument arity / in_specs), which the mirror-bearing tests
    above never reach."""
    n, e = 2048, 4096
    src = rng.integers(0, n, e)
    off = rng.integers(1, 64, e)  # |off| < B=128: always in-band
    dst = (src + off * rng.choice([-1, 1], e)) % n
    ssym = np.concatenate([src, dst])
    dsym = np.concatenate([dst, src])
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    assert dbg.ccoo.d_src.shape[0] == 0 and dbg.spill.d_src.shape[0] == 0
    pk = pack_band(dbg)
    assert pk.Cp == 0

    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    ref = spmm_dense_band(dbg, row, col, h, precise=True)
    out = unpack_rows(spmm_band_packed(pk, dbg, row, col, pack_rows(h), True))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()),
    )
    g_ref = jax.grad(
        lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x, True)))
    )(h)
    g_pk = jax.grad(
        lambda x2: jnp.sum(
            jnp.square(spmm_band_packed(pk, dbg, row, col, x2, True))
        )
    )(pack_rows(h))
    np.testing.assert_allclose(
        np.asarray(unpack_rows(g_pk)), np.asarray(g_ref),
        rtol=3e-2, atol=3e-2 * float(jnp.abs(g_ref).max()),
    )


def test_sever_edges_packed_consistent(rng):
    """sever_edges_packed keeps the frozen packed layout in sync with dbg:
    in-band, mirror, and spill severs all apply identically to both engines
    (ADVICE r1: dense_band.sever_edges alone would leave pk.base_pk stale)."""
    from mdcommunity_tpu.ops.band_pallas import sever_edges_packed
    from mdcommunity_tpu.ops.dense_band import sever_edges

    n, e = 2048, 4096
    ssym, dsym = _ring_graph(rng, n, e)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    assert dbg.ccoo.d_src.shape[0] > 0
    pk = pack_band(dbg)

    # sever a mix: some in-band directed edges, some mirror/overflow edges
    k = 16
    idx = rng.choice(len(ssym), k // 2, replace=False)
    sev_s = list(ssym[idx])
    sev_d = list(dsym[idx])
    ov = np.asarray(dbg.c_usrc)[: k // 2]
    ovd = np.asarray(dbg.c_udst)[: k // 2]
    sev_s += list(ov)
    sev_d += list(ovd)
    src_a = jnp.asarray(np.asarray(sev_s, np.int32))
    dst_a = jnp.asarray(np.asarray(sev_d, np.int32))
    valid = jnp.ones((len(sev_s),), bool)

    pk2, dbg2 = sever_edges_packed(pk, dbg, src_a, dst_a, valid)
    dbg_ref = sever_edges(dbg, src_a, dst_a, valid)
    np.testing.assert_array_equal(np.asarray(dbg2.base), np.asarray(dbg_ref.base))
    np.testing.assert_array_equal(np.asarray(dbg2.w_cov), np.asarray(dbg_ref.w_cov))

    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.1)
    row, col = live_scales(dbg2, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    ref = spmm_dense_band(dbg_ref, row, col, h, precise=True)
    out = unpack_rows(spmm_band_packed(pk2, dbg2, row, col, pack_rows(h), True))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()),
    )
    # and the stale-pk failure mode is real: without the packed-side edit the
    # in-band severs are dropped
    stale = unpack_rows(spmm_band_packed(pk, dbg_ref, row, col, pack_rows(h), True))
    assert not np.allclose(
        np.asarray(stale), np.asarray(ref),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()),
    )


def test_packed_precise_exact(rng):
    """precise=True keeps every dot operand f32: the packed engine must match
    the f32 XLA engine to f32 accumulation-order tolerance (NOT the loose
    bf16 band of the default mode) on a full band+mirror+spill operator."""
    n, e = 4096, 8192
    ssym, dsym = _ring_graph(rng, n, e, scale=96.0)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    assert dbg.ccoo.d_src.shape[0] > 0
    pk = pack_band(dbg, G=2)
    covered = jnp.asarray(rng.random(dbg.pad_n) < 0.15)
    row, col = live_scales(dbg, covered, "mean")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = spmm_dense_band(dbg, row, col, h, precise=True)
        out = unpack_rows(
            spmm_band_packed(pk, dbg, row, col, pack_rows(h), True, precise=True)
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        rtol=1e-5, atol=1e-5 * float(jnp.abs(ref).max()),
    )
    # VJP too (backward reuses the same kernel with swapped scales)
    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(
            lambda x: jnp.sum(jnp.square(spmm_dense_band(dbg, row, col, x, True)))
        )(h)
        g_pk = jax.grad(
            lambda x2: jnp.sum(jnp.square(
                spmm_band_packed(pk, dbg, row, col, x2, True, precise=True)
            ))
        )(pack_rows(h))
    np.testing.assert_allclose(
        np.asarray(unpack_rows(g_pk)), np.asarray(g_ref),
        rtol=1e-4, atol=1e-4 * float(jnp.abs(g_ref).max()),
    )


def test_model_forward_precise_engines_agree(rng):
    """The quality fix for round 3's packed-vs-XLA AUDC gap: under
    precise=True + f32 dense layers, the packed and XLA banded model
    forwards produce the SAME Q (3e-6 at 18k on chip; tested here at 4k in
    interpret mode).  The round-3 gap (AUDC 0.129 vs 0.109 on one graph)
    was eval-path bf16 matmul rounding — different in each engine — not a
    structural packed bug."""
    from mdcommunity_tpu.graphs.banded import build_banded_duplex, pack_duplex
    from mdcommunity_tpu.models.net import banded_test_forward, init_params
    from mdcommunity_tpu.models.net_packed import banded_test_forward_packed

    n = 1024
    e = 2048
    src = rng.integers(0, n, e)
    off = np.minimum((24.0 * (rng.pareto(2.0, e) + 1)).astype(np.int64), n // 2 - 1)
    dst = (src + off * rng.choice([-1, 1], e)) % n
    keep = src != dst
    e0 = np.stack([src[keep], dst[keep]], 1)
    src2 = rng.integers(0, n, e)
    dst2 = (src2 + np.minimum((24.0 * (rng.pareto(2.0, e) + 1)).astype(np.int64), n // 2 - 1) * rng.choice([-1, 1], e)) % n
    keep2 = src2 != dst2
    e1 = np.stack([src2[keep2], dst2[keep2]], 1)
    banded, _, _ = build_banded_duplex(n, e0, e1, S=256, B=128, max_rank=n)
    pks = pack_duplex(banded)
    params = init_params(jax.random.PRNGKey(0))
    covered = np.asarray(rng.random(banded.pad_n) < 0.1)
    covered[n:] = True
    covered = jnp.asarray(covered)

    with jax.default_matmul_precision("highest"):
        qx = banded_test_forward(params, banded, covered, precise=True)
        qp = banded_test_forward_packed(
            params, banded, pks, covered, precise=True, interpret=True
        )
    a, b = np.asarray(qx), np.asarray(qp)
    fin = np.isfinite(a) & np.isfinite(b)
    assert fin.sum() > 100
    np.testing.assert_allclose(a[fin], b[fin], rtol=2e-4, atol=1e-5)
    assert int(np.argmax(np.where(fin, a, -np.inf))) == int(
        np.argmax(np.where(fin, b, -np.inf))
    )


def test_nibble_sever_duplicate_idempotent(rng):
    """A directed edge duplicated within ONE sever batch must clear its
    nibble exactly once (ADVICE r3: the old additive clear double-subtracted,
    driving the byte negative and corrupting both nibbles)."""
    from mdcommunity_tpu.ops.band_pallas import sever_edges_packed
    from mdcommunity_tpu.ops.dense_band import sever_edges

    n, e = 2048, 4096
    ssym, dsym = _ring_graph(rng, n, e)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    pk = pack_band(dbg, nibble=True)

    # duplicate the same directed edge 3x in the batch, plus its same-byte
    # neighbour (adjacent even/odd columns), plus an invalid lane
    s0, d0 = int(ssym[0]), int(dsym[0])
    a_even = (s0 // 2) * 2
    sev_s = jnp.asarray(np.asarray([s0, s0, s0, a_even, a_even + 1, 0], np.int32))
    sev_d = jnp.asarray(np.asarray([d0, d0, d0, d0, d0, 0], np.int32))
    valid = jnp.asarray(np.asarray([1, 1, 1, 1, 1, 0], bool))
    pk2, dbg2 = sever_edges_packed(pk, dbg, sev_s, sev_d, valid)
    dbg_ref = sever_edges(dbg, sev_s, sev_d, valid)
    np.testing.assert_array_equal(np.asarray(dbg2.base), np.asarray(dbg_ref.base))
    # nibble layout still decodes to the severed dense base
    assert int(np.asarray(pk2.base_pk).min()) >= 0

    covered = jnp.asarray(np.zeros(dbg.pad_n, bool))
    row, col = live_scales(dbg2, covered, "sum")
    h = jnp.asarray(rng.standard_normal((dbg.pad_n, 64)).astype(np.float32))
    ref = spmm_dense_band(dbg_ref, row, col, h, precise=True)
    out = unpack_rows(spmm_band_packed(pk2, dbg2, row, col, pack_rows(h), True))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()),
    )
