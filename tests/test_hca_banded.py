"""Parity of the banded/segment-sum HCA forward (models/hca_banded.py)
against the dense HCA forward (models/hca.py) — same graph, same params,
same state (covered + cascade-severed edges), q allclose after the banded
path's RCM permutation is unwound.

The dense path materializes [2, N, N] adjacency and [2, C, N] membership;
the banded path replaces them with band SpMM + segment-sums + per-node
gathers.  Agreement here certifies the large-graph HCA real-data path
(eval/real.py blocked branch, variant="hca")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdcommunity_tpu.graphs.banded import apply_severs, build_banded_duplex
from mdcommunity_tpu.graphs.duplex import stack_graphs
from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
from mdcommunity_tpu.graphs.io import duplex_from_layers
from mdcommunity_tpu.models.hca import hca_forward, init_hca_params, make_hca_inputs
from mdcommunity_tpu.models.hca_banded import banded_hca_forward, make_hca_band_data


@pytest.fixture(scope="module")
def setup():
    n = 180
    rng = np.random.default_rng(11)
    e0, e1 = gmm_duplex_edges(n, rng)
    g = duplex_from_layers(n, e0, e1, hca=True)
    banded, perm, _ = build_banded_duplex(n, e0, e1, S=64, B=32)
    hd = make_hca_band_data(
        np.asarray(g.comm_id)[:, :n],
        np.asarray(g.n_comms),
        np.asarray(g.hca_feat)[:n],
        perm,
        banded.pad_n,
    )
    params = init_hca_params(jax.random.PRNGKey(3))
    return n, e0, e1, g, banded, perm, hd, params


def _dense_q(params, g, covered_np, sever_np, c_pad):
    gb = stack_graphs([g])
    covered = jnp.asarray(covered_np)[None]
    sever = jnp.asarray(sever_np)[None]
    q, _ = hca_forward(
        params, gb, make_hca_inputs(gb, covered, sever, c_pad=c_pad)
    )
    return np.asarray(q[0])


def _check(q_dense, q_banded, perm, n):
    inv = np.empty(len(perm), np.int64)
    inv[perm] = np.arange(len(perm))
    qb = q_banded[inv]  # banded position of original id u -> q for node u
    for u in range(n):
        a, b = q_dense[u], qb[u]
        if np.isneginf(a) or np.isneginf(b):
            assert np.isneginf(a) and np.isneginf(b), (u, a, b)
        elif a <= -1e8 or b <= -1e8:
            # unselected-community sentinel (-1e9 scaled by the layer gate):
            # both paths must agree the node is unselected
            assert a <= -1e8 and b <= -1e8, (u, a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_intact_state_parity(setup):
    n, e0, e1, g, banded, perm, hd, params = setup
    covered = np.zeros(g.pad_n, bool)
    sever = np.zeros((2, g.pad_e), bool)
    q_dense = _dense_q(params, g, covered, sever, hd.c_pad)

    cov_b = np.zeros(banded.pad_n, bool)
    cov_b[n:] = True
    q_banded = np.asarray(
        banded_hca_forward(params, banded, hd, jnp.asarray(cov_b), precise=True)
    )
    _check(q_dense, q_banded, perm, n)


def test_mid_dismantling_parity(setup):
    """Covered nodes + severed edges: the banded path's incremental base
    edits must track the dense path's sever mask exactly."""
    n, e0, e1, g, banded, perm, hd, params = setup
    rng = np.random.default_rng(5)
    removed = rng.choice(n, size=25, replace=False)

    covered = np.zeros(g.pad_n, bool)
    covered[removed] = True

    # sever a handful of surviving undirected edges in each layer, marking
    # BOTH directed copies in the dense mask (duplex_from_layers layout:
    # copy i and i + len(edges))
    sever = np.zeros((2, g.pad_e), bool)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    banded_cur = banded
    for l, edges in enumerate((e0, e1)):
        m = len(edges)
        alive = [
            i for i, (u, v) in enumerate(edges)
            if not (covered[u] or covered[v])
        ]
        pick = rng.choice(alive, size=min(8, len(alive)), replace=False)
        sever[l, pick] = True
        sever[l, pick + m] = True
        s = jnp.asarray(inv[edges[pick, 0]].astype(np.int32))
        d = jnp.asarray(inv[edges[pick, 1]].astype(np.int32))
        banded_cur = apply_severs(
            banded_cur, l, s, d, jnp.ones(len(pick), bool)
        )

    q_dense = _dense_q(params, g, covered, sever, hd.c_pad)

    cov_b = np.zeros(banded.pad_n, bool)
    cov_b[n:] = True
    cov_b[inv[removed]] = True
    q_banded = np.asarray(
        banded_hca_forward(
            params, banded_cur, hd, jnp.asarray(cov_b), precise=True
        )
    )
    _check(q_dense, q_banded, perm, n)


def test_packed_hca_matches_dense_engine(setup):
    """banded_hca_forward_packed (Pallas packed engine, packed-layout dense
    layers) vs banded_hca_forward (XLA band engine) — same operands, precise
    f32 dots on both sides, so agreement is tight.  Covers intact AND
    mid-dismantling (covered + severed) states."""
    from mdcommunity_tpu.graphs.banded import apply_severs_packed, pack_duplex
    from mdcommunity_tpu.models.hca_banded import banded_hca_forward_packed

    n, e0, e1, g, _banded_small, _perm_small, _hd_small, params = setup
    # the module fixture's S=64/B=32 band is below the packed kernel's
    # 128-alignment; rebuild at S=B=128 (same graph, same HCA data path)
    banded, perm, _ = build_banded_duplex(n, e0, e1, S=128, B=128)
    hd = make_hca_band_data(
        np.asarray(g.comm_id)[:, :n],
        np.asarray(g.n_comms),
        np.asarray(g.hca_feat)[:n],
        perm,
        banded.pad_n,
    )
    pks = pack_duplex(banded)
    rng = np.random.default_rng(5)

    def check(banded_x, pks_x, cov_b):
        with jax.default_matmul_precision("highest"):
            q_ref = np.asarray(
                banded_hca_forward(
                    params, banded_x, hd, jnp.asarray(cov_b), precise=True
                )
            )
            q_pk = np.asarray(
                banded_hca_forward_packed(
                    params, banded_x, pks_x, hd, jnp.asarray(cov_b),
                    precise=True, interpret=True,
                )
            )
        fin = np.isfinite(q_ref)
        assert (fin == np.isfinite(q_pk)).all()
        sel = fin & (q_ref > -1e8)
        assert ((q_pk > -1e8) == (q_ref > -1e8))[fin].all()
        np.testing.assert_allclose(q_pk[sel], q_ref[sel], rtol=2e-4, atol=1e-5)

    cov_b = np.zeros(banded.pad_n, bool)
    cov_b[n:] = True
    check(banded, pks, cov_b)

    # mid-dismantling: cover some nodes + sever some live edges both ways
    cov_b2 = cov_b.copy()
    cov_b2[rng.choice(n, 20, replace=False)] = True
    inv = np.empty(len(perm), np.int64)
    inv[perm] = np.arange(len(perm))
    banded2, pks2 = banded, pks
    for layer, e in ((0, e0), (1, e1)):
        pick = rng.choice(len(e), 8, replace=False)
        s = inv[e[pick, 0]].astype(np.int32)
        d = inv[e[pick, 1]].astype(np.int32)
        sp = np.zeros(8, np.int32); dp = np.zeros(8, np.int32)
        vp = np.ones(8, bool)
        sp[:], dp[:] = s, d
        banded2, pks2 = apply_severs_packed(
            banded2, pks2, layer, jnp.asarray(sp), jnp.asarray(dp),
            jnp.asarray(vp),
        )
    check(banded2, pks2, cov_b2)
