from mdcommunity_tpu.ops.aggregate import (  # noqa: F401
    dense_adjacency,
    spmm_coo,
    segment_spmm,
)
