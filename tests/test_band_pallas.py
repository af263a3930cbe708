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
def test_packed_matches_dense_band(rng, agg):
    n, e = 4096, 8192
    ssym, dsym = _ring_graph(rng, n, e)
    dbg = build_dense_band(ssym, dsym, None, n, S=512, B=128, dtype=jnp.int8)
    assert dbg.ccoo.d_src.shape[0] > 0, "want mirror-lane coverage"
    pk = pack_band(dbg)

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


def test_pack_roundtrip(rng):
    h = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(unpack_rows(pack_rows(h))), h)
