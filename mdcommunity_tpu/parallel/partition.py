"""Edge-partitioned aggregation for large duplex graphs (graph parallelism).

The scale analogue of the reference's index compaction is partitioning, not
sequence parallelism (SURVEY.md §5.7): both duplex layers' edge lists are
sharded across the 'gp' mesh axis; every chip computes a partial neighborhood
aggregation for its edge shard into the full node space, and a psum over 'gp'
combines the halos.  Node features stay replicated over 'gp' (at 64-dim
embeddings a 10^6-node graph's feature block is 256 MB — HBM-resident), so the
halo exchange is exactly one all-reduce per SpMM, which XLA schedules on ICI and
overlaps with the local scatter-add.

Interlayer coupling edges need no special routing in this scheme: both layers'
shards live on the same mesh axis and the cascade's cross-layer masks are
elementwise in node space.

`partitioned_spmm` is the shard_map building block; `spmm_sharded` is the jit
entry that accepts a gp-sharded COO and returns replicated output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _local_spmm(src, dst, w, h, pad_n):
    msg = h[src] * w[:, None]
    out = jnp.zeros((pad_n, h.shape[-1]), h.dtype).at[dst].add(msg)
    return jax.lax.psum(out, axis_name="gp")


def spmm_edge_partitioned(mesh: Mesh, src, dst, w, h):
    """A @ H with edges sharded over 'gp' and H replicated.

    src/dst/w: [E] (E divisible by gp size), h: [N, D].  Returns [N, D]
    replicated.
    """
    pad_n = h.shape[0]
    fn = shard_map(
        partial(_local_spmm, pad_n=pad_n),
        mesh=mesh,
        in_specs=(P("gp"), P("gp"), P("gp"), P()),
        out_specs=P(),
    )
    return fn(src, dst, w, h)


def shard_edges(mesh: Mesh, src, dst, w):
    """Place COO arrays sharded over 'gp' (pad E to a multiple of gp first)."""
    sh = NamedSharding(mesh, P("gp"))
    return (
        jax.device_put(src, sh),
        jax.device_put(dst, sh),
        jax.device_put(w, sh),
    )
