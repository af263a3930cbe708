"""Command-line entry points (reference layer 6: train.py, testReal.py,
testSynthetic.py, analysis_comparison.py, drawUnweight.py).

Usage:
  python -m mdcommunity_tpu.cli train --variant unit_cost [--smoke] [--resume]
  python -m mdcommunity_tpu.cli test-real --model M --data DIR -o OUT [--datasets ...]
  python -m mdcommunity_tpu.cli test-synthetic --model M [--sizes 32 64 ...]
  python -m mdcommunity_tpu.cli baseline --method degree --combine max2 ...
  python -m mdcommunity_tpu.cli analyze --unitcost DIR --community DIR -o OUT
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _setup_jax(cpu: bool = False):
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")


def cmd_train(args):
    _setup_jax(args.cpu)
    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config, smoke_requested

    import dataclasses as _dc

    cfg = Config(variant=args.variant, seed=args.seed)
    over = {}
    if args.max_iteration:
        over["max_iteration"] = args.max_iteration
    if args.gmm_g is not None:
        over["gmm_g"] = None if args.gmm_g < 0 else args.gmm_g
    if args.prioritized:
        over["use_prioritized"] = True
    if over:
        cfg = _dc.replace(cfg, **over)
    if args.smoke or smoke_requested():
        cfg = cfg.smoke
    save_dir = args.save_dir or f"./models_tpu/{args.variant}_GMM_{cfg.num_min}_{cfg.num_max}"
    if args.smoke or smoke_requested():
        save_dir += "_SMOKE"
    agent = DQNAgent(cfg)
    agent.train(save_dir=save_dir, resume=args.resume)


def _load_params(model_path: str):
    if model_path.endswith(".ckpt") and os.path.getsize(model_path) < 10_000_000:
        # could be a reference torch checkpoint or one of ours; sniff pickle
        try:
            from mdcommunity_tpu.models.torch_convert import load_torch_checkpoint

            return load_torch_checkpoint(model_path)
        except Exception:
            pass
    import pickle

    with open(model_path, "rb") as f:
        state = pickle.load(f)
    import jax

    return jax.tree_util.tree_map(lambda x: x, state["params"])


def cmd_test_real(args):
    _setup_jax(args.cpu)
    from mdcommunity_tpu.eval.real import evaluate_real
    from mdcommunity_tpu.graphs.io import REAL_DATASETS

    params = _load_params(args.model)
    names = args.datasets or list(REAL_DATASETS)
    os.makedirs(args.output, exist_ok=True)
    for name in names:
        try:
            sol, t, score = evaluate_real(
                params, args.data, name, args.output,
                step_ratio=args.step_ratio, variant=args.variant,
                packed=args.packed, n_nodes=args.n_nodes,
                layers=tuple(args.layers) if args.layers else None,
                batch_env=args.batch_env, precise=not args.fast,
            )
            print(f"{name}: audc={score:.6f} time={t:.2f}s removed={len(sol)}")
        except FileNotFoundError as e:
            print(f"{name}: SKIP ({e})", file=sys.stderr)


def cmd_test_synthetic(args):
    _setup_jax(args.cpu)
    from mdcommunity_tpu.eval.synthetic import (
        evaluate_synthetic_generated,
        evaluate_synthetic_sweep,
        write_result_rows,
    )

    params = _load_params(args.model)
    if args.sweep_param:
        rows = evaluate_synthetic_sweep(
            params, args.sweep_param, args.sweep_values,
            size=args.sizes[0], n_graphs=args.n_graphs, variant=args.variant,
        )
    else:
        rows = evaluate_synthetic_generated(
            params, sizes=args.sizes, n_graphs=args.n_graphs, variant=args.variant,
        )
    out = args.output or f"./result_synthetic_{args.variant}.txt"
    write_result_rows(out, rows, args.variant)
    for r in rows:
        print(json.dumps(r))


def cmd_baseline(args):
    _setup_jax(args.cpu)
    import numpy as np

    from mdcommunity_tpu.eval.baselines import heuristic_dismantle
    from mdcommunity_tpu.eval.writers import append_time_audc
    from mdcommunity_tpu.graphs.gmm import gmm_duplex_edges
    from mdcommunity_tpu.graphs.io import duplex_from_layers
    import time as _t

    rng = np.random.default_rng(args.seed)
    scores = []
    for i in range(args.n_graphs):
        e0, e1 = gmm_duplex_edges(args.size, rng)
        g = duplex_from_layers(args.size, e0, e1)
        if int(g.max_rank) <= 1:
            continue
        t0 = _t.time()
        sol, score, _ = heuristic_dismantle(
            g, args.method, args.combine, args.protect_frac,
            syn_stop=args.syn_stop,
        )
        scores.append(score)
        if args.output:
            append_time_audc(args.output, f"syn_{args.size}_{i}", _t.time() - t0, score)
    print(
        json.dumps(
            dict(
                method=args.method, combine=args.combine, size=args.size,
                score_mean=float(np.mean(scores)), score_std=float(np.std(scores)),
                n=len(scores),
            )
        )
    )


def cmd_analyze(args):
    from mdcommunity_tpu.eval.analysis import comparison_report

    comparison_report(args.unitcost, args.community, args.output)


def cmd_summarize_edges(args):
    """Dataset stats + recommended layer pair per .edges file (reference:
    summarize_real_edges.py)."""
    from mdcommunity_tpu.graphs.io import summarize_multiplex_dir

    rows = summarize_multiplex_dir(args.data, args.output)
    cols = ["dataset", "n_nodes", "n_layers", "layer_m", "layer_n"]
    print("\t".join(cols))
    for r in rows:
        print("\t".join(str(r[c]) for c in cols))
    if args.output:
        print(f"Summary written to: {args.output}")


def cmd_check_features(args):
    """Sanity-check community prior/HCA features on a fresh GMM graph
    (reference: check_features.py — shape, range in [0, 1])."""
    _setup_jax(args.cpu)
    import numpy as np

    from mdcommunity_tpu.graphs.gmm import generate_pool

    rng = np.random.default_rng(args.seed)
    prior = "hca" if args.variant == "hca" else args.feature
    (g,) = generate_pool(rng, 1, args.size, args.size, 64, 2048, False, prior)
    if args.variant == "hca":
        feats = np.asarray(g.hca_feat)[: args.size]
        print("hca_feat shape (f_het, f_impact, f_roi):", feats.shape)
        print("first 5 rows:\n", feats[:5])
        print("f_het within [0,1]:", bool((feats[:, 0] >= 0).all() and (feats[:, 0] <= 1).all()))
    else:
        feats = np.asarray(g.node_feat)[:, : args.size]
        print("prior feature shape:", feats.shape)
        print("first 5 cols:\n", feats[:, :5])
        print("min:", feats.min(), "max:", feats.max())
        print("values within [0,1]:", bool((feats >= 0).all() and (feats <= 1).all()))


def main(argv=None):
    p = argparse.ArgumentParser(prog="mdcommunity_tpu")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    # --cpu also accepted after the subcommand
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--cpu", action="store_true", help="force CPU backend")
    _sub = p.add_subparsers(dest="cmd", required=True)

    class _Sub:
        def add_parser(self, name, **kw):
            kw.setdefault("parents", []).append(common)
            return _sub.add_parser(name, **kw)

    sub = _Sub()

    t = sub.add_parser("train")
    t.add_argument("--variant", default="unit_cost",
                   choices=["unit_cost", "degree_cost", "ce", "hca"])
    t.add_argument("--smoke", action="store_true")
    t.add_argument("--resume", action="store_true")
    t.add_argument("--save-dir", default=None)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--max-iteration", type=int, default=0,
                   help="override Config.max_iteration (0 = default)")
    t.add_argument("--prioritized", action="store_true",
                   help="prioritized replay sampling (IsPrioritizedSampling; "
                        "the reference ships this stubbed, ours is functional)")
    t.add_argument("--gmm-g", type=float, default=None,
                   help="GMM angular correlation; negative = U(0,1) per graph")
    t.set_defaults(fn=cmd_train)

    r = sub.add_parser("test-real")
    r.add_argument("--model", required=True)
    r.add_argument("--data", required=True, help="directory with .edges files")
    r.add_argument("-o", "--output", required=True)
    r.add_argument("--datasets", nargs="*", default=None)
    r.add_argument("--step-ratio", type=float, default=0.0)
    r.add_argument("--variant", default="unit_cost")
    r.add_argument("--packed", action="store_true",
                   help="large-graph path: Pallas packed band engine "
                        "(models/net_packed.py) instead of the XLA dense-band")
    r.add_argument("--n-nodes", type=int, default=None,
                   help="node count for datasets not in the built-in table")
    r.add_argument("--layers", type=int, nargs=2, default=None,
                   help="coupled layer pair for datasets not in the table")
    r.add_argument("--batch-env", action="store_true",
                   help="ONE host cascade per StepRatio batch "
                        "(env.step_many; AUDC bias <= step/n — the "
                        "10^6-node protocol)")
    r.add_argument("--fast", action="store_true",
                   help="bf16 eval forward (precise=False); default is the "
                        "f32-precise quality path")
    r.set_defaults(fn=cmd_test_real)

    s = sub.add_parser("test-synthetic")
    s.add_argument("--model", required=True)
    s.add_argument("--sizes", type=int, nargs="*",
                   default=[32, 64, 128, 256, 512, 1024])
    s.add_argument("--n-graphs", type=int, default=20)
    s.add_argument("--variant", default="unit_cost")
    s.add_argument("-o", "--output", default=None)
    s.add_argument("--sweep-param", default=None, choices=["g", "gamma", "k"],
                   help="sweep a generator parameter instead of sizes "
                        "(reference data_g/data_gamma/data_k)")
    s.add_argument("--sweep-values", type=float, nargs="*",
                   default=[0.1, 0.3, 0.5, 0.7, 0.9])
    s.set_defaults(fn=cmd_test_synthetic)

    b = sub.add_parser("baseline")
    b.add_argument("--method", default="degree",
                   choices=["degree", "betweenness", "closeness", "ci", "pagerank"])
    b.add_argument("--combine", default="max2", choices=["max2", "add"])
    b.add_argument("--protect-frac", type=float, default=0.0)
    b.add_argument("--syn-stop", action="store_true",
                   help="_syn-script early stop: stop once rank <= sqrt(N) "
                        "(hda_2max_syn.py:78-81)")
    b.add_argument("--size", type=int, default=64)
    b.add_argument("--n-graphs", type=int, default=10)
    b.add_argument("--seed", type=int, default=0)
    b.add_argument("-o", "--output", default=None)
    b.set_defaults(fn=cmd_baseline)

    a = sub.add_parser("analyze")
    a.add_argument("--unitcost", required=True)
    a.add_argument("--community", required=True)
    a.add_argument("-o", "--output", default="final_comparison_report.csv")
    a.set_defaults(fn=cmd_analyze)

    se = sub.add_parser("summarize-edges")
    se.add_argument("--data", required=True, help="directory with .edges files")
    se.add_argument("-o", "--output", default=None)
    se.set_defaults(fn=cmd_summarize_edges)

    cf = sub.add_parser("check-features")
    cf.add_argument("--variant", default="ce", choices=["ce", "hca"])
    cf.add_argument("--feature", default="boundary",
                    choices=["boundary", "participation"])
    cf.add_argument("--size", type=int, default=30)
    cf.add_argument("--seed", type=int, default=0)
    cf.set_defaults(fn=cmd_check_features)

    _register_draw(sub)

    args = p.parse_args(argv)
    args.fn(args)




def _register_draw(sub):
    def cmd_draw(args):
        from mdcommunity_tpu.eval.plots import plot_lmcc_curves

        curves = {}
        for spec in args.curves:
            label, path = spec.split("=", 1)
            # weighted (drawWeight) curves take label=Cost_file:LMCC_file —
            # x = cumulative cost read from the cost file (drawWeight.py:63-68)
            curves[label] = tuple(path.split(":", 1)) if ":" in path else path
        plot_lmcc_curves(
            curves, args.output, title=args.title, weighted=args.weighted
        )
        print(f"wrote {args.output}")

    d = sub.add_parser(
        "draw", help="LMCC-curve comparison plot (reference drawLmcc)"
    )
    d.add_argument("curves", nargs="+",
                   help="label=NormalizedLMCC_file.txt pairs (weighted: "
                        "label=Cost_file.txt:NormalizedLMCC_file.txt)")
    d.add_argument("-o", "--output", required=True)
    d.add_argument("--title", default="")
    d.add_argument("--weighted", action="store_true",
                   help="x axis is cumulative cost (drawWeight)")
    d.set_defaults(fn=cmd_draw)


if __name__ == "__main__":
    main()
