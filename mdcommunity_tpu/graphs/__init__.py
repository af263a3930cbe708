from mdcommunity_tpu.graphs.duplex import DuplexGraph, GraphPool, build_duplex  # noqa: F401
