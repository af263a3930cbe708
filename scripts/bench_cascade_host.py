"""Host-only benchmark of the native cascade engine at 10^6-node scale.

The 1M dismantling loop is host-cascade-bound (RESULTS r04 per-batch
attribution: 542 ms of ~910 ms per StepRatio batch is env.step_many).  This
probe isolates exactly that component with NO TPU in the loop: it builds the
same shuffled-id 2^20 duplex surrogate as scripts/large_graph_demo.py and
dismantles it in StepRatio-sized batches chosen by a deterministic
highest-degree-first policy (a stand-in for the model's hub-first picks), so
an A/B across engine versions does bit-identical work.

Usage: python scripts/bench_cascade_host.py [--n 1048576] [--batch 1048]
       [--max-batches 0 = to terminal]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.large_graph_demo import synth_duplex_edges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=1048)
    ap.add_argument("--max-batches", type=int, default=0)
    ap.add_argument("--avg-deg", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--band-order", action="store_true",
                    help="relabel nodes to the generator's angular (band-"
                         "local) order and sort edges by min endpoint — the "
                         "id layout the band build already computes; union-"
                         "find accesses become cache-local")
    ap.add_argument("--skip", type=int, default=0,
                    help="remove this many hubs in one untimed prefix batch "
                         "first (measures the late-phase regime)")
    args = ap.parse_args()

    from mdcommunity_tpu import native

    rng = np.random.default_rng(args.seed)
    e0, e1 = synth_duplex_edges(args.n, args.avg_deg, rng,
                                shuffle=not args.band_order)
    if args.band_order:
        e0 = np.sort(e0, axis=1)
        e1 = np.sort(e1, axis=1)
        e0 = e0[np.argsort(e0[:, 0], kind="stable")]
        e1 = e1[np.argsort(e1[:, 0], kind="stable")]
    t0 = time.perf_counter()
    env = native.NativeDuplexEnv(args.n, e0, e1)
    t_build = time.perf_counter() - t0

    deg = np.zeros(args.n, np.int64)
    for e in (e0, e1):
        np.add.at(deg, e[:, 0], 1)
        np.add.at(deg, e[:, 1], 1)
    order = np.argsort(-deg, kind="stable")  # hub-first, deterministic

    times, removed_total, pos = [], 0, 0
    if args.skip:
        env.step_many(order[:args.skip])
        pos = args.skip
    while not env.terminal and pos < args.n:
        batch = order[pos:pos + args.batch]
        pos += args.batch
        t1 = time.perf_counter()
        _, _, removed = env.step_many(batch)
        times.append(time.perf_counter() - t1)
        removed_total += removed
        if args.max_batches and len(times) >= args.max_batches:
            break

    ms = 1e3 * np.asarray(times)
    print(json.dumps({
        "n": args.n,
        "edges_directed": 2 * (len(e0) + len(e1)),
        "batch": args.batch,
        "batches": len(times),
        "removed": removed_total,
        "build_s": round(t_build, 2),
        "cascade_total_s": round(float(ms.sum() / 1e3), 2),
        "ms_per_batch_mean": round(float(ms.mean()), 1),
        "ms_per_batch_p50": round(float(np.median(ms)), 1),
        "ms_per_batch_max": round(float(ms.max()), 1),
        "score": round(env.score, 6),
        "rank_final": env.rank,
        "terminal": env.terminal,
    }))


if __name__ == "__main__":
    main()
