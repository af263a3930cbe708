"""gp-sharded block-banded dense SpMM — halo exchange over ICI.

This is the scalable form of ops/dense_band.py (BASELINE.json north star:
edge-partitioned duplex layers, boundary-feature halo exchange over ICI
overlapped with local aggregation, >=80% edges/s scaling efficiency):

  * NODES (and hence band blocks and edges) are sharded contiguously over the
    'gp' mesh axis — locality ordering (graphs/ordering.py) makes the shard
    boundary a narrow band cut.
  * The only cross-chip traffic per SpMM is
      - two `ppermute`s of B boundary rows ([B, D] each — the halo; B is the
        band half-width, thousands of times smaller than N/P), and
      - one `all_gather` of the compacted mirror table ([nb*C, D] — overflow
        edges ride the mirror compaction of dense_band, so long-range edges
        cost one small gather instead of any full-table traffic).
    The overlap with local compute is STRUCTURAL (round 5): the interior
    blocks' contraction — all but the first/last local block — is emitted
    with no data dependence on either ppermute (verified on the compiled
    HLO def-use graph by scripts/probe_overlap_structural.py), so any
    backend may run the halo exchange concurrently with the bulk of the
    FLOPs; only the 2-block boundary contraction waits for the halo.
  * Compare parallel/partition.py (`spmm_edge_partitioned`): that baseline
    psums the FULL [N, D] output every call — correct, but its collective
    volume grows with N; this one's is O(B·D + nb·C·D), independent of N/P.

The public entry `spmm_band_sharded(mesh, dbg, row, col, h)` mirrors
`ops.dense_band.spmm_dense_band` (same math, same custom symmetric VJP) with
all operands sharded over 'gp'; `shard_band_graph` / `shard_band_vectors`
place the operands.

Reference analogue: none — the reference is single-GPU (SURVEY.md §2.7); the
hot kernel being distributed is its `torch_sparse.spmm`
(MultiDismantler_net_graphsage.py:139-377).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mdcommunity_tpu.ops.dense_band import DenseBandGraph
from mdcommunity_tpu.ops.spmm_csr import _seg

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _band3_local(
    base_l, ccoo_src, ccoo_dst, w_cov, g_lanes, hc,
    *, S, B, C, n_mirror, nparts, precise,
):
    """Local band + mirror contraction of an already col-scaled h shard.

    hc: [local_n, D].  Returns [local_n, D] (rows this chip owns).
    Symmetric in the stored operator, so the backward reuses it verbatim.
    """
    axis = "gp"
    dt = jnp.float32 if precise else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if precise else None
    mm = partial(jnp.einsum, preferred_element_type=jnp.float32, precision=prec)

    hcd = hc.astype(dt)
    nb_l = hcd.shape[0] // S
    xb = hcd.reshape(nb_l, S, -1)
    fwd_perm = [(i, (i + 1) % nparts) for i in range(nparts)]
    bwd_perm = [(i, (i - 1) % nparts) for i in range(nparts)]
    # halo: my tail B rows -> right neighbor (I receive my LEFT neighbor's
    # tail); my head B rows -> left neighbor (I receive my RIGHT's head).
    left = jax.lax.ppermute(hcd[-B:], axis, fwd_perm)
    right = jax.lax.ppermute(hcd[:B], axis, bwd_perm)
    based = base_l.astype(dt)

    # STRUCTURAL interior/boundary split (round 5): only the FIRST local
    # block reads the left halo and only the LAST reads the right one, so
    # the interior blocks' contraction — the bulk of the FLOPs — is issued
    # with NO data dependence on either ppermute: the compiler is free to
    # (and the dataflow proves it may) run the collectives concurrently
    # with it, rather than us hoping the scheduler hoists pieces of one
    # fused einsum.  The two boundary blocks contract separately once
    # their halo row-strips arrive.  scripts/probe_overlap_structural.py
    # verifies the dependence structure in the lowered HLO.
    if nb_l >= 3:
        hw_int = jnp.concatenate(
            [xb[:-2, S - B:], xb[1:-1], xb[2:, :B]], axis=1
        )  # [nb_l-2, S+2B, D] — purely local rows
        out_int = mm("bkw,bwd->bkd", based[1:-1], hw_int)
        hw_b = jnp.stack([
            jnp.concatenate([left, xb[0], xb[1, :B]], axis=0),
            jnp.concatenate([xb[-2, S - B:], xb[-1], right], axis=0),
        ])  # [2, S+2B, D] — the only windows that touch the halo
        out_b = mm("bkw,bwd->bkd", based[jnp.array([0, nb_l - 1])], hw_b)
        out_ext = jnp.concatenate(
            [out_b[:1], out_int, out_b[1:]], axis=0
        )
    else:
        prev_tail = jnp.concatenate([left[None], xb[:-1, S - B:]], axis=0)
        nxt_head = jnp.concatenate([xb[1:, :B], right[None]], axis=0)
        hw = jnp.concatenate([prev_tail, xb, nxt_head], axis=1)
        out_ext = mm("bkw,bwd->bkd", based, hw)
    out = out_ext[:, :S]
    if C and n_mirror:
        d = out.shape[-1]
        sub_local = out_ext[:, S:].reshape(nb_l * C, d)
        sub = jax.lax.all_gather(sub_local, axis, tiled=True)  # [nb*C, D]
        out_sub = _seg(sub[ccoo_src] * w_cov[:, None], ccoo_dst, n_mirror)
        p = jax.lax.axis_index(axis)
        mine = jax.lax.dynamic_slice_in_dim(out_sub, p * nb_l * C, nb_l * C)
        out = out + mm(
            "bcs,bcd->bsd", g_lanes.astype(dt), mine.reshape(nb_l, C, d).astype(dt)
        )
    return out.reshape(nb_l * S, -1)


@lru_cache(maxsize=32)
def _build(mesh: Mesh, S: int, B: int, C: int, n_mirror: int, precise: bool):
    nparts = mesh.shape["gp"]
    local = partial(
        _band3_local, S=S, B=B, C=C, n_mirror=n_mirror, nparts=nparts,
        precise=precise,
    )
    band3 = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("gp"), P(), P(), P(), P("gp"), P("gp")),
        out_specs=P("gp"),
    )

    @jax.custom_vjp
    def op(base, ccoo_src, ccoo_dst, w_cov, g_lanes, row, col, h):
        hc = h * col[:, None]
        return band3(base, ccoo_src, ccoo_dst, w_cov, g_lanes, hc) * row[:, None]

    def fwd(base, ccoo_src, ccoo_dst, w_cov, g_lanes, row, col, h):
        out = op(base, ccoo_src, ccoo_dst, w_cov, g_lanes, row, col, h)
        return out, (base, ccoo_src, ccoo_dst, w_cov, g_lanes, row, col)

    def bwd(res, g):
        base, ccoo_src, ccoo_dst, w_cov, g_lanes, row, col = res
        # (R A C)^T = C A R for the symmetric stored operator
        gr = g * row[:, None]
        dh = band3(base, ccoo_src, ccoo_dst, w_cov, g_lanes, gr) * col[:, None]
        return (None, None, None, None, None, None, None, dh)

    op.defvjp(fwd, bwd)
    return jax.jit(op)


def spmm_band_sharded(
    mesh: Mesh,
    dbg: DenseBandGraph,
    row: jnp.ndarray,
    col: jnp.ndarray,
    h: jnp.ndarray,
    precise: bool = False,
) -> jnp.ndarray:
    """out = (A * row⊗col) @ h, node dimension sharded over mesh axis 'gp'.

    Same semantics/VJP as ops.dense_band.spmm_dense_band (band + mirror
    overflow; differentiable in h only).  Requires n_blocks % gp == 0 and an
    empty spill set (build the band so overflow fits the mirror lanes —
    build_dense_band's defaults do for locality-ordered graphs).
    """
    if dbg.spill.d_src.shape[0]:
        raise ValueError(
            "sharded band SpMM requires an empty spill set; raise C or B in "
            "build_dense_band"
        )
    nparts = mesh.shape["gp"]
    if dbg.n_blocks % nparts:
        raise ValueError(f"n_blocks={dbg.n_blocks} not divisible by gp={nparts}")
    g_lanes = dbg.base[:, dbg.S:, dbg.B: dbg.B + dbg.S]
    n_mirror = dbg.n_blocks * dbg.C if dbg.ccoo.d_src.shape[0] else 0
    op = _build(mesh, dbg.S, dbg.B, dbg.C, n_mirror, bool(precise))
    return op(
        dbg.base, dbg.ccoo.d_src, dbg.ccoo.d_dst, dbg.w_cov, g_lanes,
        row, col, h,
    )


# ---------------------------------------------------------------------------
# packed Pallas kernel as the local engine (halo windows, linear DMA)
# ---------------------------------------------------------------------------

def _packed_local(
    base_pk, oh, odd, geT, cc_src, cc_dst, w_cov, row, col, h2,
    *, S, B, Cp, G, D, n_mirror, nparts, interpret, nibble,
):
    """One shard's packed band contraction: ppermute h/col halos, pre-gather
    scale windows, mirror compaction + all_gather, then the Pallas kernel in
    halo mode (ops.band_pallas._make_kernel(halo=True): linear windows over
    [lh | h2 | rh]).

    STRUCTURAL interior/boundary split (round 5, mirroring _band3_local):
    only the first and last G-block programs read the ppermuted halo
    strips, so the kernel runs as THREE calls — the interior programs (fed
    exclusively by local h2/col rows, including their "halo" refs, which
    are just neighboring local slices) plus one single-program call per
    boundary.  The interior call — the bulk of the work — therefore has no
    data dependence on either ppermute and may run concurrently with the
    halo exchange on any backend.  (When Cp > 0 the mirror `mine` operand
    still gates every call on the mirror all_gather: mirror contributions
    are inherently global.  n_prog < 3 keeps the single fused call.)"""
    from mdcommunity_tpu.ops.band_pallas import _make_kernel

    axis = "gp"
    local_nb = base_pk.shape[0]
    Sh, Bh = S // 2, B // 2
    GSh = G * Sh  # packed rows per program
    n_prog = local_nb // G
    fwd_perm = [(i, (i + 1) % nparts) for i in range(nparts)]
    bwd_perm = [(i, (i - 1) % nparts) for i in range(nparts)]
    lh = jax.lax.ppermute(h2[-Bh:], axis, fwd_perm)   # left neighbor's tail
    rh = jax.lax.ppermute(h2[:Bh], axis, bwd_perm)    # right neighbor's head
    lc = jax.lax.ppermute(col[-B:], axis, fwd_perm)
    rc = jax.lax.ppermute(col[:B], axis, bwd_perm)

    GR = G * S // 128
    BR = B // 128
    WR = GR + 2 * BR
    colv_loc = col.reshape(-1, 128)
    roww = row.reshape(n_prog, GR, 128)

    geT_mine = None
    if Cp:
        from mdcommunity_tpu.ops.band_pallas import mirror_compact

        mir_l = mirror_compact(
            oh, odd, col.reshape(local_nb, Sh, 2),
            h2.reshape(local_nb, Sh, 2 * D), D,
        ).reshape(local_nb * Cp, D)
        mir_all = jax.lax.all_gather(mir_l, axis, tiled=True)  # [nb*Cp, D]
        sub = _seg(mir_all[cc_src] * w_cov[:, None], cc_dst, n_mirror)
        p = jax.lax.axis_index(axis)
        mine = jax.lax.dynamic_slice_in_dim(
            sub, p * local_nb * Cp, local_nb * Cp
        ).reshape(local_nb, Cp, D)
        geT_mine = (geT, mine)

    def call(b0, b1, h2_sub, lh_sub, rh_sub, colw_sub, roww_sub):
        nb_sub = b1 - b0
        run = _make_kernel(
            nb_sub, S, B, Cp, D, G, "full", h2.dtype, halo=True,
            nibble=nibble,
        )
        args = [base_pk[b0:b1], h2_sub, colw_sub, roww_sub, lh_sub, rh_sub]
        if Cp:
            args += [geT_mine[0][b0:b1], geT_mine[1][b0:b1]]
        return run(*args, interpret=interpret)  # [nb_sub, Sh, 2D]

    if n_prog >= 3:
        # boundary col windows: [lc | local rows] and [local rows | rc]
        colw_f = jnp.concatenate(
            [lc.reshape(BR, 128), colv_loc[:WR - BR]], axis=0
        )[None]
        colw_l = jnp.concatenate(
            [colv_loc[len(colv_loc) - (WR - BR):], rc.reshape(BR, 128)],
            axis=0,
        )[None]
        # interior col windows: purely local rows (no collective ancestry)
        ci_int = (
            jnp.arange(1, n_prog - 1)[:, None] * GR - BR
            + jnp.arange(WR)[None, :]
        )
        colw_int = jnp.take(colv_loc, ci_int, axis=0)

        out_int = call(
            G, local_nb - G,
            h2[GSh:(n_prog - 1) * GSh],
            h2[GSh - Bh:GSh],                       # local "halo" slices
            h2[(n_prog - 1) * GSh:(n_prog - 1) * GSh + Bh],
            colw_int, roww[1:-1],
        )
        out_f = call(0, G, h2[:GSh], lh, h2[GSh:GSh + Bh], colw_f, roww[:1])
        out_l = call(
            local_nb - G, local_nb,
            h2[(n_prog - 1) * GSh:],
            h2[(n_prog - 1) * GSh - Bh:(n_prog - 1) * GSh], rh,
            colw_l, roww[-1:],
        )
        out = jnp.concatenate([out_f, out_int, out_l], axis=0)
    else:
        colv = jnp.concatenate([lc, col, rc]).reshape(-1, 128)
        ci = jnp.arange(n_prog)[:, None] * GR + jnp.arange(WR)[None, :]
        colw = jnp.take(colv, ci, axis=0)             # [n_prog, WR, 128]
        out = call(0, local_nb, h2, lh, rh, colw, roww)
    return out.reshape(local_nb * Sh, 2 * D)


@lru_cache(maxsize=32)
def _build_packed(mesh, S, B, Cp, G, D, n_mirror, dtype, interpret,
                  nibble=False):
    nparts = mesh.shape["gp"]
    local = partial(
        _packed_local, S=S, B=B, Cp=Cp, G=G, D=D, n_mirror=n_mirror,
        nparts=nparts, interpret=interpret, nibble=nibble,
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("gp"),) * 4 + (P(), P(), P()) + (P("gp"),) * 3,
        out_specs=P("gp"),
        # pallas_call's out_shape carries no varying-mesh-axes annotation, so
        # the vma checker cannot see through it
        check_vma=False,
    )

    @jax.custom_vjp
    def op(base_pk, oh, odd, geT, cs, cd, wc, row, col, h2):
        return fn(base_pk, oh, odd, geT, cs, cd, wc, row, col, h2)

    def fwd(base_pk, oh, odd, geT, cs, cd, wc, row, col, h2):
        out = op(base_pk, oh, odd, geT, cs, cd, wc, row, col, h2)
        return out, (base_pk, oh, odd, geT, cs, cd, wc, row, col)

    def bwd(res, g2):
        base_pk, oh, odd, geT, cs, cd, wc, row, col = res
        # (R·A·C)^T = C·A·R for the symmetric stored operator
        dh2 = op(base_pk, oh, odd, geT, cs, cd, wc, col, row, g2)
        return (None,) * 9 + (dh2,)

    op.defvjp(fwd, bwd)
    return jax.jit(op)


def spmm_band_packed_sharded(
    mesh: Mesh,
    pk,
    dbg: DenseBandGraph,
    row: jnp.ndarray,
    col: jnp.ndarray,
    h2: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed-layout sharded band SpMM: out2 = pack(row ⊙ (A @ (col ⊙ h))),
    node dimension sharded over 'gp', the Pallas packed kernel as each
    shard's local engine (vs spmm_band_sharded's XLA einsum).

    pk = ops.band_pallas.pack_band(dbg); h2 packed [pad_n/2, 2D].  Same
    collective volume as spmm_band_sharded: two B-row ppermutes + one mirror
    all_gather.  Requires an empty spill set and local block counts divisible
    by pk.G."""
    if dbg.spill.d_src.shape[0]:
        raise ValueError("sharded packed SpMM requires an empty spill set")
    nparts = mesh.shape["gp"]
    nb = pk.nb
    if nb % nparts or (nb // nparts) % pk.G:
        raise ValueError(
            f"n_blocks={nb} not divisible into gp={nparts} shards of "
            f"G={pk.G}-block programs; rebuild with a smaller G"
        )
    if pk.B > pk.G * pk.S:
        # the halo-mode first/last-program window DMAs assume the B/2-packed-
        # row halo fits beside at least one full program window in the local
        # shard; violating this would read out of bounds silently on TPU
        raise ValueError(
            f"halo window needs B <= G*S (got B={pk.B}, G*S={pk.G * pk.S})"
        )
    D = h2.shape[1] // 2
    n_mirror = nb * pk.Cp if dbg.ccoo.d_src.shape[0] else 0
    op = _build_packed(
        mesh, pk.S, pk.B, pk.Cp, pk.G, D, n_mirror, h2.dtype,
        bool(interpret), nibble=pk.nibble,
    )
    return op(
        pk.base_pk, pk.oh, pk.odd, pk.geT,
        pk.ccoo.d_src, pk.ccoo.d_dst, dbg.w_cov, row, col, h2,
    )


def shard_packed_band(mesh: Mesh, pk):
    """Place a PackedBand: block-major leaves sharded over 'gp', mirror COO
    replicated."""
    import dataclasses

    blk = NamedSharding(mesh, P("gp"))
    rep = NamedSharding(mesh, P())
    return dataclasses.replace(
        pk,
        base_pk=jax.device_put(pk.base_pk, blk),
        oh=jax.device_put(pk.oh, blk),
        odd=jax.device_put(pk.odd, blk),
        geT=jax.device_put(pk.geT, blk),
        ccoo=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), pk.ccoo),
    )


def shard_band_graph(mesh: Mesh, dbg: DenseBandGraph) -> DenseBandGraph:
    """Place the band operator: blocks sharded over 'gp', overflow replicated."""
    import dataclasses

    blk = NamedSharding(mesh, P("gp"))
    rep = NamedSharding(mesh, P())
    return dataclasses.replace(
        dbg,
        base=jax.device_put(dbg.base, blk),
        ccoo=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), dbg.ccoo),
        w_cov=jax.device_put(dbg.w_cov, rep),
        c_usrc=jax.device_put(dbg.c_usrc, rep),
        c_udst=jax.device_put(dbg.c_udst, rep),
        spill=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), dbg.spill),
        w_spill=jax.device_put(dbg.w_spill, rep),
    )


def shard_band_vectors(mesh: Mesh, *arrs):
    """Place node-dimension vectors/features sharded over 'gp'."""
    sh = NamedSharding(mesh, P("gp"))
    out = tuple(jax.device_put(a, sh) for a in arrs)
    return out if len(out) > 1 else out[0]
