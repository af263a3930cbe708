"""Bandwidth-reducing node orderings for blocked sparse kernels.

The blocked-pair SpMM layout (ops/pallas_spmm.py) does one S x 2D MXU pass per
(dst-block, src-block) pair chunk, so its efficiency is the pair fill factor —
the fraction of T slots per chunk holding real edges.  Locality in the node
numbering is what creates fill: GMM synthetic graphs are banded under angular
order by construction (graphs/gmm.py), and real multiplex networks
(testReal datasets, up to ~56k nodes) become banded after a reverse
Cuthill-McKee pass over the union of both layers' edges.

The reference never reorders (networkx dict-order graphs,
MultiDismantler_torch.read_multiplex :602-635); this module is TPU-specific
layout preparation with no reference analogue.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee


def rcm_order(src_layers, dst_layers, n: int) -> np.ndarray:
    """Permutation `perm` (new position -> old id) minimizing the bandwidth of
    the UNION of the given layers' adjacencies (both duplex layers must share
    one ordering: the cascade couples them node-wise)."""
    rows = np.concatenate([np.asarray(s, np.int64) for s in src_layers])
    cols = np.concatenate([np.asarray(d, np.int64) for d in dst_layers])
    data = np.ones(len(rows), np.int8)
    a = sp.coo_matrix((data, (rows, cols)), shape=(n, n)).tocsr()
    a = a + a.T
    return np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True), np.int64)


def apply_order(
    perm: np.ndarray, src: np.ndarray, dst: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Relabel edge endpoints under `perm` (new position -> old id)."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv[np.asarray(src, np.int64)], inv[np.asarray(dst, np.int64)]


def bandwidth(src: np.ndarray, dst: np.ndarray) -> int:
    """Max |src - dst| — the quantity RCM minimizes; fill ~ S^2 * density when
    the band fits in a few source blocks per destination block."""
    if len(src) == 0:
        return 0
    return int(np.abs(np.asarray(src, np.int64) - np.asarray(dst, np.int64)).max())
