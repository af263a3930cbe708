#!/bin/bash
# On-chip measurement checklist (run from the repo root, ONE job at a time —
# concurrent TPU jobs through the axon tunnel have wedged it before).
# Usage: bash scripts/chip_checklist.sh [outdir]
set -x
out=${1:-/tmp/chip_r02}
mkdir -p "$out"

# 1. Mosaic lowering validation of the packed kernel (correctness only)
timeout 580 python scripts/bench_band_packed.py --n 18 --e 20 --correct-only \
  2>&1 | tee "$out/correct_small.log"

# 2. Full-op A/B at bench shapes
timeout 580 python scripts/bench_band_packed.py 2>&1 | tee "$out/ab_full.log"

# 2b. G sweep + bf16 + time attribution (one process, amortized transfers)
timeout 580 python scripts/tune_band_packed.py --bf16 --diag \
  2>&1 | tee "$out/tune.log"

# 3. Headline bench (exactly what the driver runs)
timeout 580 python bench.py 2>&1 | tee "$out/bench.log"

# 4. Model-level throughput (XLA vs packed forward)
timeout 580 python scripts/bench_model_level.py 2>&1 | tee "$out/model_level.log"

# 5. Large-graph dismantling per-step (packed engine)
timeout 580 python scripts/large_graph_demo.py --sizes 18222 --packed \
  -o /tmp/large_demo_pk 2>&1 | tee "$out/large_demo.log"
