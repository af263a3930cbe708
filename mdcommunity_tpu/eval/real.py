"""Real multiplex network evaluation (reference: EvaluateRealData :645-709 and
testReal.py).  Loads a `.edges` multiplex, picks the coupled layer pair, runs the
greedy dismantling rollout with stepRatio batching, and writes the reference's
result-file formats."""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import numpy as np

from mdcommunity_tpu.eval.metrics import dismantle_greedy
from mdcommunity_tpu.eval.writers import (
    append_time_audc,
    write_cost_curve,
    write_lmcc_curve,
    write_solution,
)
from mdcommunity_tpu.graphs.io import REAL_DATASETS, load_real_duplex


def evaluate_real(
    params,
    data_path: str,
    dataset: str,
    save_dir: str,
    step_ratio: float = 0.0,
    variant: str = "unit_cost",
    layers: Optional[Tuple[int, int]] = None,
    n_nodes: Optional[int] = None,
    blocked_threshold: int = 4096,
    packed: bool = False,
    precise: bool = True,
    batch_env: bool = False,
) -> Tuple[list, float, float]:
    """Dismantle one real dataset; returns (solution, solve_time, score).

    Output files (in <save_dir>/StepRatio_<r>/) mirror the reference:
      Soluion_<name>_<la><lb>.txt, NormalizedLMCC_<name>_<la><lb>.txt
    """
    if dataset in REAL_DATASETS:
        fname, n_default, pair_default = REAL_DATASETS[dataset]
    else:
        fname, n_default, pair_default = dataset, None, None
    n_nodes = n_nodes or n_default
    layers = layers or pair_default
    if n_nodes is None or layers is None:
        raise ValueError(f"unknown dataset {dataset}: pass n_nodes and layers")

    path = os.path.join(data_path, fname)
    blocked = n_nodes > blocked_threshold and variant in (
        "unit_cost", "degree_cost", "ce", "hca",
    )
    # CE attaches the static community prior at real-data load time (reference
    # _attach_static_comm_prior, CEMultiDismantler/MultiDismantler_torch.py:743
    # — test-time action pruning stays OFF, ACTION_PRUNING_TEST=False :49)
    prior_feature = "boundary" if variant == "ce" else None
    prior_cache_dir = os.path.join(save_dir, "real_cache") if prior_feature else None
    g = load_real_duplex(
        path, n_nodes, layers, degree_cost=(variant == "degree_cost"),
        prior_feature=prior_feature, prior_cache_dir=prior_cache_dir,
        hca=(variant == "hca"),
        # the blocked path computes max_rank host-side (build_banded_duplex's
        # env); the small-graph device cascade's full-table gathers crash the
        # TPU worker at 10^6 nodes, so skip it here
        max_rank=0 if blocked else None,
    )
    g_orig = g  # original-id graph (the blocked path relabels nodes)

    perm = None
    max_rank_out = None
    step = max(int(step_ratio * n_nodes), 1) if step_ratio > 0 else 1

    if blocked:
        # large nets: RCM-reorder + dense-band aggregation (graphs/banded.py)
        # with the cascade on host (env/host_env.py) — the reference's CPU-env
        # / device-net split, with the device side jitted end-to-end.  HCA
        # routes its community pooling through the segment-sum banded forward
        # (models/hca_banded.py) — the reference's HCA testReal.py:27-68 runs
        # its 14k–18k-node datasets, so must we.
        from mdcommunity_tpu.env.host_env import make_host_env
        from mdcommunity_tpu.eval.metrics import dismantle_greedy_banded
        from mdcommunity_tpu.graphs.banded import build_banded_duplex
        from mdcommunity_tpu.graphs.io import read_multiplex_edges

        raw = read_multiplex_edges(path, n_nodes)
        e0 = raw.get(layers[0], np.zeros((0, 2), np.int32))
        e1 = raw.get(layers[1], np.zeros((0, 2), np.int32))
        weights = np.asarray(g.weights) if variant == "degree_cost" else None
        node_feat = (
            np.asarray(g.node_feat)[:, :n_nodes] if variant == "ce" else None
        )
        banded, perm, (oe0, oe1) = build_banded_duplex(
            n_nodes, e0, e1, weights=weights, node_feat=node_feat
        )
        hca_data = None
        if variant == "hca":
            from mdcommunity_tpu.models.hca_banded import make_hca_band_data

            hca_data = make_hca_band_data(
                np.asarray(g.comm_id)[:, :n_nodes],
                np.asarray(g.n_comms),
                np.asarray(g.hca_feat)[:n_nodes],
                perm,
                banded.pad_n,
            )
        env = make_host_env(
            n_nodes, oe0, oe1,
            weights=np.asarray(banded.weights)[:, :n_nodes]
            if variant == "degree_cost" else None,
        )
        t0 = time.time()
        sol, score, curve = dismantle_greedy_banded(
            params, banded, env, step=step, variant=variant, packed=packed,
            hca_data=hca_data, precise=precise, batch_env=batch_env,
        )
        solve_time = time.time() - t0
        sol = [int(perm[v]) for v in sol]  # back to original node ids
        g = g_orig
        max_rank_out = int(banded.max_rank)
    else:
        if packed:
            import sys

            print(
                f"[evaluate_real] --packed ignored: {dataset} "
                f"(n={n_nodes}) takes the small-graph path "
                f"(blocked_threshold={blocked_threshold}, variant={variant})",
                file=sys.stderr,
            )
        t0 = time.time()
        sol, score, curve = dismantle_greedy(params, g, step=step, variant=variant)
        solve_time = time.time() - t0

    sub = os.path.join(save_dir, f"StepRatio_{step_ratio:.4f}")
    base = dataset.split(".")[0]
    tag = f"{base}_{layers[0]}{layers[1]}"
    write_solution(os.path.join(sub, f"Soluion_{tag}.txt"), sol)
    # curve[0] is the leading 1.0; per-removal entries follow (reference writes
    # MaxCCList whose first entry is 1, :686, then pads with 1/max_rank)
    write_lmcc_curve(
        os.path.join(sub, f"NormalizedLMCC_{tag}.txt"),
        curve,
        n_nodes,
        max_rank_out if max_rank_out is not None else int(g.max_rank),
        score_mean=score,
        score_std=0.0,
    )
    if variant == "degree_cost":
        # sol is in original ids at this point; use original-id weights
        write_cost_curve(
            os.path.join(sub, f"Cost_{tag}.txt"),
            np.asarray(g_orig.weights), sol, n_nodes, score,
        )
    append_time_audc(
        os.path.join(save_dir, "time&audc_real.csv"), dataset, solve_time, score
    )
    return sol, solve_time, score
