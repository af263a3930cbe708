"""Sorted-COO SpMM with a symmetric custom VJP — the large-graph aggregation op.

Graph structure is static in this framework (liveness is a weight mask), so we
precompute BOTH edge orderings once per graph:

  * destination-sorted — forward out[dst] += w·h[src] becomes a contiguous
    segment reduction (indices_are_sorted): no random scatter.
  * source-sorted      — backward dh[src] += w·g[dst] uses the same contiguous
    reduction in the other direction.
  * dw is SDDMM: dw_e = h[src_e]·g[dst_e] — pure gathers.

A Pallas TPU kernel can replace `_seg` without touching callers; this module is
the API boundary the BASELINE edges/s metric is measured at.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortedCOO:
    """Dual-sorted COO for one layer.

    d_src/d_dst : int32[E] edges sorted by destination (forward order)
    s_src/s_dst : int32[E] edges sorted by source (backward order)
    s2d         : int32[E] source-order position j -> forward-order index
                  (so w_source_order = w_dest_order[s2d])
    n           : static padded node count
    """

    d_src: jnp.ndarray
    d_dst: jnp.ndarray
    s_src: jnp.ndarray
    s_dst: jnp.ndarray
    s2d: jnp.ndarray
    n: int = dataclasses.field(metadata=dict(static=True))


def build_sorted_coo(src: np.ndarray, dst: np.ndarray, n: int) -> SortedCOO:
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    od = np.argsort(dst, kind="stable")
    osrc = np.argsort(src, kind="stable")
    # source-order edge j is original edge osrc[j]; its position in dst order
    # is pos_d[osrc[j]] where pos_d inverts od
    pos_d = np.empty_like(od)
    pos_d[od] = np.arange(len(src))
    return SortedCOO(
        d_src=jnp.asarray(src[od]),
        d_dst=jnp.asarray(dst[od]),
        s_src=jnp.asarray(src[osrc]),
        s_dst=jnp.asarray(dst[osrc]),
        s2d=jnp.asarray(pos_d[osrc].astype(np.int32)),
        n=n,
    )


def _seg(values, ids, n):
    return jax.ops.segment_sum(values, ids, num_segments=n, indices_are_sorted=True)


@jax.custom_vjp
def spmm_sorted(coo: SortedCOO, w_d: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """out = A @ h with per-edge weights w_d given in destination-sorted order."""
    return _seg(h[coo.d_src] * w_d[:, None], coo.d_dst, coo.n)


def _fwd(coo, w_d, h):
    return spmm_sorted(coo, w_d, h), (coo, w_d, h)


def _bwd(res, g):
    coo, w_d, h = res
    # dh[src] += w·g[dst]  — contiguous in source order
    w_s = w_d[coo.s2d]
    dh = _seg(g[coo.s_dst] * w_s[:, None], coo.s_src, coo.n)
    # dw_e = h[src_e]·g[dst_e]  (destination order)
    dw = jnp.sum(h[coo.d_src] * g[coo.d_dst], axis=-1)
    return None, dw, dh


spmm_sorted.defvjp(_fwd, _bwd)
