"""Tracing / profiling helpers.

The reference's observability is wall-clock prints around validation windows
(MultiDismantler_torch.py:497,510-523) and per-dataset solve-time CSVs.  Here:
jax.profiler trace capture, a timing context that blocks on device work, and
throughput counters (edges/s, steps/s) for the training loop and kernels.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def device_timer(name: str, sink: Optional[Dict[str, float]] = None, log=None):
    """Wall-clock a block, blocking on outstanding device work at exit."""
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    if log:
        log(f"[timer] {name}: {dt:.3f}s")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Accumulates (units, seconds) and reports units/s — used for the
    edges/s/chip counters around aggregation kernels and env steps."""

    def __init__(self, unit: str = "edges"):
        self.unit = unit
        self.units = 0.0
        self.seconds = 0.0

    def add(self, units: float, seconds: float):
        self.units += units
        self.seconds += seconds

    @property
    def rate(self) -> float:
        return self.units / self.seconds if self.seconds > 0 else 0.0

    def json(self, name: str) -> str:
        return json.dumps(
            {"metric": name, "value": round(self.rate, 1), "unit": f"{self.unit}/s"}
        )
