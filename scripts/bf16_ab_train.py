"""bf16-vs-f32 training-quality A/B (VERDICT r2 #7): two 4000-iteration
unit-cost runs on the SAME backend/seed/schedule, differing only in
Config.dtype (jax_default_matmul_precision bfloat16 vs full f32).  Run
ON-CHIP — the knob is a TPU MXU lever; CPU ignores it.

Each run executes in its own subprocess (the matmul-precision flag is a
process global), sequentially — one TPU job at a time.  Writes
models_tpu/unit_cost_{f32,bf16}_tpu4k/ModelVC_30_50.csv and prints a JSON
summary line."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import dataclasses, sys
sys.path.insert(0, {root!r})
import jax
if {highest!r} == "highest":
    # true f32 accumulation (3/6-pass) — the slow reference arm; the DEFAULT
    # TPU execution of f32 matmuls is already single-pass bf16, so
    # Config.dtype="bfloat16" is a no-op there (verified: bit-identical
    # 4k-iter curves) and the meaningful A/B is default-vs-HIGHEST
    jax.config.update("jax_default_matmul_precision", "highest")
from mdcommunity_tpu.rl.dqn import DQNAgent
from mdcommunity_tpu.utils.config import Config
cfg = dataclasses.replace(
    Config(variant="unit_cost", seed=0), max_iteration=4000, dtype={dtype!r}
)
agent = DQNAgent(cfg, seed=0)
agent.train(save_dir={save!r})
"""


def main():
    out = {}
    for dtype, tag, highest in (
        ("float32", "f32hi", "highest"), ("bfloat16", "bf16", "def"),
    ):
        save = os.path.join(ROOT, "models_tpu", f"unit_cost_{tag}_tpu4k")
        code = CHILD.format(root=ROOT, dtype=dtype, save=save, highest=highest)
        r = subprocess.run(
            [sys.executable, "-c", code], cwd=ROOT,
            capture_output=True, text=True, timeout=2400,
        )
        if r.returncode:
            print(r.stdout[-2000:], file=sys.stderr)
            print(r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"{tag} run failed")
        vc_path = os.path.join(save, "ModelVC_30_50.csv")
        out[tag] = [float(x) for x in open(vc_path)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
