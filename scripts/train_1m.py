"""End-to-end TRAINING at 10^6-node scale (round 5; BASELINE config 5).

Builds the same shuffled-id 2^20-node duplex as the dismantling demo
(scripts/large_graph_demo.py), warm-starts from a trained 30-50-node
checkpoint (the policy generalizes — RESULTS heuristics tables), and runs
the full banded training loop (rl/big_trainer.py: eps-greedy StepRatio
rollout -> batched host cascade -> TD targets -> banded_train_loss fits ->
target-net snapshots) ON the large graph, measuring greedy dismantling AUDC
on the identical graph before and after.

The reference's Train() (MultiDismantler_torch.py:433-547) tops out at
N=30-50 training / N=18,222 eval; this trains at 57x its largest eval N.

Usage: python scripts/train_1m.py [--n 1048576] [--iters 600] [-o DIR]
Prints one JSON line per phase; writes history JSONL + checkpoint to DIR.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.large_graph_demo import synth_duplex_edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--k", type=int, default=1048)
    ap.add_argument("--model",
                    default="models_tpu/unit_cost_full_r4/best_model.ckpt")
    ap.add_argument("--scratch", action="store_true",
                    help="random-init instead of warm-start")
    ap.add_argument("-o", "--output", default="results_tpu/train1m")
    ap.add_argument("--avg-deg", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eps-start", type=float, default=0.1)
    ap.add_argument("--eps-end", type=float, default=0.02)
    ap.add_argument("--target-update", type=int, default=100)
    ap.add_argument("--no-packed", action="store_true")
    ap.add_argument("--no-eval", action="store_true",
                    help="skip the greedy before/after AUDC evals")
    ap.add_argument("--skip-pre-eval", action="store_true",
                    help="skip only the before eval (already measured: "
                         "0.030207 on this graph/seed, r04+r05 artifacts)")
    ap.add_argument("--eval-k", type=int, default=None,
                    help="StepRatio batch for the greedy evals (default: "
                         "same as --k; pin to 1048 when sweeping the "
                         "TRAINING k so the eval protocol stays fixed)")
    args = ap.parse_args()
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(args.output, f"train1m_n{args.n}.jsonl")
    out = open(out_path, "w")

    def emit(row):
        print(json.dumps(row), flush=True)
        out.write(json.dumps(row) + "\n")
        out.flush()

    from mdcommunity_tpu.env.host_env import make_host_env
    from mdcommunity_tpu.eval.metrics import dismantle_greedy_banded
    from mdcommunity_tpu.graphs.banded import build_banded_duplex
    from mdcommunity_tpu.rl.big_trainer import train_banded_loop
    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config

    agent = DQNAgent(Config(variant="unit_cost"), seed=args.seed)
    if not args.scratch:
        try:
            agent.load(args.model)
        except Exception:
            agent.load_torch(args.model)
    params = agent.params

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    e0, e1 = synth_duplex_edges(args.n, args.avg_deg, rng, shuffle=True)
    banded, perm, (oe0, oe1) = build_banded_duplex(args.n, e0, e1)
    t_build = time.time() - t0
    emit({"phase": "build", "n": args.n,
          "edges": int(len(e0) + len(e1)), "build_s": round(t_build, 1)})

    packed = not args.no_packed

    eval_k = args.eval_k or args.k

    def greedy_eval(p, tag):
        env_e = make_host_env(args.n, oe0, oe1)
        t1 = time.time()
        sol, score, curve = dismantle_greedy_banded(
            p, banded, env_e, step=eval_k, packed=packed,
            batch_env=True, precise=True,
        )
        emit({"phase": f"eval_{tag}", "audc": round(score, 6),
              "removals": len(sol), "solve_s": round(time.time() - t1, 1)})
        return score

    if not args.no_eval and not args.skip_pre_eval:
        greedy_eval(params, "before")

    env = make_host_env(args.n, oe0, oe1)
    t2 = time.time()
    p2, hist = train_banded_loop(
        params, banded, env,
        iters=args.iters, k=args.k, lr=args.lr,
        eps_start=args.eps_start, eps_end=args.eps_end,
        target_update=args.target_update, packed=packed,
        seed=args.seed,
    )
    t_train = time.time() - t2
    for h in hist:
        out.write(json.dumps(h) + "\n")
    out.flush()
    iter_rows = [h for h in hist if "loss" in h]
    t_iters = [h["t_iter_s"] for h in iter_rows]
    emit({"phase": "train", "iters": len(iter_rows),
          "fit_iters": sum(1 for h in iter_rows if np.isfinite(h["loss"])),
          "train_wall_s": round(t_train, 1),
          "t_iter_mean_s": round(float(np.mean(t_iters)), 3),
          "t_iter_p50_s": round(float(np.median(t_iters)), 3),
          "loss_first10": round(float(np.nanmean(
              [h["loss"] for h in iter_rows[:10]])), 5),
          "loss_last10": round(float(np.nanmean(
              [h["loss"] for h in iter_rows[-10:]])), 5)})

    ckpt = os.path.join(args.output, f"train1m_n{args.n}.ckpt")
    with open(ckpt, "wb") as f:
        pickle.dump({"params": __import__("jax").device_get(p2)}, f)
    emit({"phase": "checkpoint", "path": ckpt})

    if not args.no_eval:
        greedy_eval(p2, "after")
    out.close()


if __name__ == "__main__":
    main()
