"""Device meshes and sharding helpers.

The reference is single-process single-GPU (MultiDismantler_torch.py:110,
num_env=1 :59) with zero distributed machinery; scaling here is designed
TPU-first per SURVEY.md §2.7:

  dp — data parallel: environments / replay batches sharded across chips; XLA
       inserts the gradient all-reduce (psum over 'dp') from sharding
       annotations on the jitted train step.
  gp — graph parallel: edge lists of both duplex layers partitioned across
       chips for large graphs; partial neighborhood aggregations are combined
       with psum over 'gp' (see parallel/partition.py).

Multi-host: the same meshes span hosts via jax.distributed.initialize(); ICI
carries 'gp' collectives (latency-sensitive halo traffic), DCN carries 'dp'
gradient reductions — arrange axes accordingly when building the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    gp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // gp
    assert dp * gp == len(devices), (dp, gp, len(devices))
    arr = np.array(devices).reshape(dp, gp)
    return Mesh(arr, axis_names=("dp", "gp"))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with leading batch dim sharded over 'dp'."""
    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bring-up: call once per host before building meshes.

    On TPU pods the three arguments are discovered from the environment
    (jax.distributed.initialize() with no args); pass them explicitly for
    manual CPU/GPU multi-process runs.  Returns the process index.  After
    this, `jax.devices()` spans the whole slice and `make_mesh` distributes
    the global device list: put 'gp' on the minor (ICI-contiguous) axis so
    halo collectives ride ICI and 'dp' gradient all-reduces may cross DCN.
    """
    import jax

    # must not query the backend (jax.process_count()/jax.devices()) before
    # initialize — that freezes a single-process XLA client; inspect the
    # distributed service state instead
    try:
        from jax._src.distributed import global_state as _gs

        already = _gs.client is not None
    except Exception:  # pragma: no cover - private-API drift
        already = False

    if not already:
        if coordinator_address is not None or num_processes not in (None, 1):
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            try:
                jax.distributed.initialize()
            except Exception:
                pass  # single-process run (no cluster env): nothing to do
    return jax.process_index()
