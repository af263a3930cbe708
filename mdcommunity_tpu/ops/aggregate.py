"""Neighborhood-aggregation kernels: the TPU replacement for torch_sparse.spmm.

The reference's single hot kernel is `torch_sparse.spmm(index, value, m, n, H)`
(call sites: MultiDismantler_net_graphsage.py:139,146,199,290,297,350,377 and the
Laplacian loss, MultiDismantler_torch.py:420).  On TPU there are two regimes:

* small graphs (training: 30-50 nodes, batches of 64): materialize the live
  adjacency as a dense [N, N] tile and let the MXU do A @ H — with N padded to
  the 128-lane envelope this is the speed-of-light path, and XLA fuses the mask
  construction into the matmul's producer.
* large graphs (real multiplex nets up to ~56k nodes): COO gather/segment-add
  (`spmm_coo`), optionally via the Pallas kernel in ops/pallas_spmm.py.

Both paths share the edge-weight convention of the reference's aggregators
(PrepareBatchGraph.n2n_construct :236-245): aggregator_id 0 = sum (w=1),
1 = mean (w=1/deg_dst), 2 = GCN norm (w=1/sqrt((deg_u+1)(deg_v+1))).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_adjacency(src, dst, weight, pad_n: int) -> jnp.ndarray:
    """COO (src, dst, weight) -> dense [pad_n, pad_n] with A[dst, src] += w.

    Row i of the result aggregates *into* node i (matches spmm(n2nsum, H) where
    n2nsum rows are destinations).
    """
    a = jnp.zeros((pad_n, pad_n), weight.dtype)
    return a.at[dst, src].add(weight)


def segment_spmm(src, dst, weight, h, pad_n: int) -> jnp.ndarray:
    """Sparse A @ H via gather + scatter-add: out[dst] += w * h[src].

    h: [N, D] -> [N, D].  Weight already encodes aggregator normalization and
    edge liveness (0 for dead/padded edges).
    """
    msg = h[src] * weight[:, None]
    return jnp.zeros((pad_n, h.shape[-1]), h.dtype).at[dst].add(msg)


def spmm_coo(src, dst, weight, h, pad_n: int) -> jnp.ndarray:
    """COO SpMM entry point (segment path).  For the high-throughput blocked
    Pallas kernel use ops.pallas_spmm.spmm with a BlockCOO layout."""
    return segment_spmm(src, dst, weight, h, pad_n)


def edge_weights(
    src, dst, live, pad_n: int, aggregator_id: int = 0
) -> jnp.ndarray:
    """Aggregation weights per directed edge (0 where dead)."""
    w = live.astype(jnp.float32)
    if aggregator_id == 0:
        return w
    deg = jnp.zeros(pad_n, jnp.float32).at[dst].add(w)
    if aggregator_id == 1:
        return w / jnp.maximum(deg[dst], 1.0)
    if aggregator_id == 2:
        return w / jnp.sqrt((deg[src] + 1.0) * (deg[dst] + 1.0))
    raise ValueError(f"unknown aggregator_id {aggregator_id}")


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """Row-wise L2 normalization matching torch.nn.functional.normalize:
    x / max(||x||, eps).  Zero rows stay zero.

    Written as x * rsqrt(max(Σx², eps²)) — NOT x / max(norm(x), eps): the norm's
    VJP at an exact-zero row is 0/0 = NaN, and 0-cotangent · NaN = NaN, so the
    naive form poisons every backward pass through the padded (dead-node) rows.
    With the clamp inside the sqrt the zero-row gradient is exactly 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps * eps))
