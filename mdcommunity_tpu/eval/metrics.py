"""Dismantling rollouts and scoring (AUDC / normalized-LMCC curves).

Reference call sites:
  GetSolution :711-736  — greedy rollout taking `step` nodes per model call
                          (argsort of Q, stepRatio batching) writing the
                          MaxCCList curve
  GetSol      :759-784  — same + cost fraction
  Test        :738-755  — validation scoring: score + remaining/(max_rank·N)
  mvc_env.stepWithoutReward :74-87 — score += rank/(max_rank·N) per removal;
                          MaxCCList appends rank/max_rank, starts at [1]

AUDC = Σ_t rank_t/(max_rank·N): the area under the normalized-LMCC curve.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mdcommunity_tpu.env.env import batched_reset, batched_step
from mdcommunity_tpu.graphs.duplex import DuplexGraph, stack_graphs
from mdcommunity_tpu.rl.dqn import predict_q


import functools


@functools.lru_cache(maxsize=16)
def _make_fused_step(variant: str, packed: bool, fuse: bool, precise: bool):
    """Module-level cache of the StepRatio-0 fused step (severs + cover +
    forward + top-k in ONE device call).  MUST be cached here, not defined
    per dismantle call: a fresh closure re-jits, and one compile costs ~40 s
    on the tunnel."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def fused_step(params, banded, pks, hd, covered, packed_args, k):
        # ONE uploaded buffer per step: [2, 3, PAD] sever arrays + the
        # action appended at [0, 0, PAD] — separate uploads each cost a
        # tunnel round trip
        a = packed_args[0, 0, -1]
        s0, d0, v0 = (packed_args[0, 0, :-1], packed_args[0, 1, :-1],
                      packed_args[0, 2, :-1] != 0)
        s1, d1, v1 = (packed_args[1, 0, :-1], packed_args[1, 1, :-1],
                      packed_args[1, 2, :-1] != 0)
        if packed:
            from mdcommunity_tpu.graphs.banded import apply_severs_packed

            banded, pks = apply_severs_packed(banded, pks, 0, s0, d0, v0)
            banded, pks = apply_severs_packed(banded, pks, 1, s1, d1, v1)
        else:
            from mdcommunity_tpu.graphs.banded import apply_severs

            banded = apply_severs(banded, 0, s0, d0, v0)
            banded = apply_severs(banded, 1, s1, d1, v1)
        covered = covered.at[a].set(True)
        with _prec_ctx(precise):
            if variant == "hca" and packed:
                from mdcommunity_tpu.models.hca_banded import (
                    banded_hca_forward_packed,
                )

                q = banded_hca_forward_packed(
                    params, banded, pks, hd, covered, precise=precise
                )
            elif variant == "hca":
                from mdcommunity_tpu.models.hca_banded import (
                    banded_hca_forward,
                )

                q = banded_hca_forward(
                    params, banded, hd, covered, precise=precise
                )
            elif packed:
                from mdcommunity_tpu.models.net_packed import (
                    banded_test_forward_packed,
                )

                q = banded_test_forward_packed(
                    params, banded, pks, covered, variant=variant,
                    fuse_sage=fuse, precise=precise,
                )
            else:
                from mdcommunity_tpu.models.net import banded_test_forward

                q = banded_test_forward(
                    params, banded, covered, variant=variant, precise=precise
                )
        vals, order = jax.lax.top_k(q, k)
        # one fetchable array: order is exact in f32 for pad_n < 2^24
        vo = jnp.stack([vals, order.astype(jnp.float32)])
        return banded, pks, covered, vo

    return fused_step


def _prec_ctx(precise: bool):
    """f32 matmul precision for quality-critical eval forwards (trace-time
    setting: applies to the dense layers traced inside the jitted q fns;
    the aggregation engines take their own `precise` operand-dtype flag)."""
    import contextlib

    return (
        jax.default_matmul_precision("highest")
        if precise
        else contextlib.nullcontext()
    )


def dismantle_greedy(
    params,
    g: DuplexGraph,
    step: int = 1,
    variant: str = "unit_cost",
    dense: Optional[bool] = None,
    max_steps: Optional[int] = None,
    syn_stop: bool = False,
) -> Tuple[List[int], float, List[float]]:
    """Greedy Q rollout on one (unbatched) graph.

    Removes the top-`step` scoring nodes per model call (reference GetSolution's
    batchSol = argsort(-pred)[:step]); re-checks terminality between removals.

    syn_stop=True uses the baseline `_syn` scripts' early-stop convention
    (stop once rank <= sqrt(N), hda_2max_syn.py:78-81) so model scores are
    comparable with syn-convention heuristic sweeps.

    Returns (solution node list, score = AUDC, MaxCCList curve starting at 1.0).
    """
    aggregate_fn = None
    if hasattr(g, "bcoo"):  # BlockedDuplex: blocked-pair Pallas aggregation
        from mdcommunity_tpu.models.net import make_blocked_aggregate

        aggregate_fn = make_blocked_aggregate(g)
        g = g.g
        dense = False
    if dense is None:
        dense = g.pad_n <= 2048
    degree_cost = variant == "degree_cost"
    gb = stack_graphs([g])
    state = batched_reset(gb)
    sol: List[int] = []
    curve: List[float] = [1.0]
    n = int(g.n_nodes)
    max_steps = max_steps or n
    stop_rank = float(np.sqrt(n)) if syn_stop else 0.0

    while (
        not bool(state.terminal[0])
        and len(sol) < max_steps
        and float(state.rank[0]) > stop_rank
    ):
        if aggregate_fn is not None:
            from mdcommunity_tpu.env.batch import make_batch_inputs
            from mdcommunity_tpu.models.net import test_forward as _tf

            inputs = make_batch_inputs(
                gb, state.covered, state.sever, dense=False, variant=variant
            )
            q = _tf(params, gb, inputs, aggregate_fn=aggregate_fn)
        else:
            q = predict_q(params, gb, state.covered, state.sever, variant, dense=dense)
        q_np = np.asarray(q[0])
        # stable: lowest index first among ties — matches the banded path's
        # device-side lax.top_k selection, so the two engines pick identical
        # solutions (the reference's unstable np.argsort leaves tie order
        # unspecified)
        order = np.argsort(-q_np, kind="stable")[:step]
        for a in order:
            if bool(state.terminal[0]) or float(state.rank[0]) <= stop_rank:
                break
            if not np.isfinite(q_np[a]):
                break
            state, _ = batched_step(gb, state, jnp.asarray([a]), degree_cost)
            sol.append(int(a))
            curve.append(float(state.rank[0]) / float(g.max_rank))
    return sol, float(state.score[0]), curve


def dismantle_batch_greedy(
    params,
    gb: DuplexGraph,
    variant: str = "unit_cost",
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy rollout over a batch of graphs at once; returns (scores, covered
    counts).  Used for fast synthetic sweeps."""
    degree_cost = variant == "degree_cost"
    state = batched_reset(gb)
    max_steps = gb.pad_n
    for _ in range(max_steps):
        if bool(jnp.all(state.terminal)):
            break
        q = predict_q(params, gb, state.covered, state.sever, variant)
        actions = jnp.argmax(q, axis=1)
        state, _ = batched_step(gb, state, actions, degree_cost)
    covered_cnt = np.asarray(jnp.sum(state.covered & gb.node_mask, axis=1))
    return np.asarray(state.score), covered_cnt


def audc_from_curve(curve: List[float], n: int) -> float:
    """AUDC from a rank/max_rank curve (excluding the leading 1.0 entry)."""
    return float(np.sum(curve[1:]) / n)


def validation_score(score: float, n: int, covered: int, max_rank: int) -> float:
    """Reference Test() metric: rollout score + untouched-node tail."""
    return score + (n - covered) / (max_rank * n)


def solution_robustness(g: DuplexGraph, solution: List[int], degree_cost: bool = False):
    """Score a full removal order by replaying it against the cascade
    (reference: Utils.getRobustness, utils.py:53-97 — which rebuilds the duplex
    in reverse insertion order; replaying forward over the same order visits
    identical states).  degree_cost replays with the cost-weighted score
    (degree_cost mvc_env.py stepWithoutReward: score += rank/max_rank · cost).
    Returns (score = AUDC, normalized-LMCC curve)."""
    gb = stack_graphs([g])
    state = batched_reset(gb)
    curve = []
    max_rank = float(g.max_rank)
    for a in solution:
        if bool(state.terminal[0]):
            break
        state, _ = batched_step(gb, state, jnp.asarray([int(a)]), degree_cost)
        curve.append(float(state.rank[0]) / max_rank)
    return float(state.score[0]), curve


def reinsert_solution(
    g: DuplexGraph, solution: List[int], each_step: int = 1
) -> List[int]:
    """Greedy reinsertion post-processing (reference: Utils.reInsert
    :12-51, shipped without its decrease-strategy object or any caller; the
    strategy implemented here is the standard component-merge count): starting
    from the dismantled graph, repeatedly re-add the removed nodes that merge
    the fewest components (union of both layers), then return the reversed
    insertion order as the improved removal order."""
    import numpy as np

    n = int(g.n_nodes)
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    em = np.asarray(g.edge_mask)
    # union adjacency over both layers
    adj = [[] for _ in range(n)]
    for l in range(2):
        for s, d in zip(src[l][em[l]], dst[l][em[l]]):
            adj[int(s)].append(int(d))

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    present = np.zeros(n, bool)
    keep = [v for v in range(n) if v not in set(solution)]
    for v in keep:
        present[v] = True
    for v in keep:
        for u in adj[v]:
            if present[u]:
                ra, rb = find(v), find(u)
                if ra != rb:
                    parent[ra] = rb

    left = list(dict.fromkeys(int(v) for v in solution))
    inserted = []
    while left:
        scored = []
        for v in left:
            roots = {find(u) for u in adj[v] if present[u]}
            scored.append((len(roots), v))
        scored.sort()
        for _, v in scored[:each_step]:
            left.remove(v)
            inserted.append(v)
            present[v] = True
            for u in adj[v]:
                if present[u]:
                    ra, rb = find(v), find(u)
                    if ra != rb:
                        parent[ra] = rb
    inserted.reverse()
    return inserted


def dismantle_greedy_banded(
    params,
    banded,
    env,
    step: int = 1,
    variant: str = "unit_cost",
    precise: bool = True,
    max_steps: Optional[int] = None,
    packed: bool = False,
    hca_data=None,
    batch_env: bool = False,
) -> Tuple[List[int], float, List[float]]:
    """Greedy Q rollout on a large BandedDuplex with a HostDuplexEnv.

    The device side (band aggregation forward + sever edits) is jitted
    end-to-end per model call; the cascade runs on host (scipy connected
    components) exactly as the reference splits CPU env / device net.
    packed=True routes the forward through the Pallas packed band engine
    (models/net_packed.py; severs edit both operand layouts).
    variant="hca" requires hca_data (models/hca_banded.HcaBandData in banded
    node order) and routes through banded_hca_forward — the segment-sum
    community path that replaces the O(N²) dense HCA inputs.

    batch_env=True amortizes the host cascade across each StepRatio batch
    (env.step_many: ONE cascade per `step` removals instead of per node) —
    the 10^6-node enabler, since per-removal cascades make a full
    dismantling Θ(N²) in host time.  Final state is exactly the sequential
    result; the curve takes the post-batch rank for each node in a batch,
    biasing AUDC by at most step/n (see host_env.step_many).

    precise (default True): every matmul of the Q forward runs in true f32
    (aggregation operands f32 + jax.default_matmul_precision('highest') for
    the dense layers) — matching the reference's f32 GPU eval.  Greedy
    dismantling quality is measurably sensitive to eval-path Q rounding:
    the default bf16 MXU passes give each engine ~8-10% of the Q RANGE in
    rounding error at N=18k (different per engine — round 3's committed
    0.129-packed vs 0.109-XLA AUDC band on the identical graph was exactly
    this), while under f32 the two engines agree to 3e-6.  precise=False
    restores the bf16 fast path for throughput-bound uses.
    Returns (solution in BANDED ids, score = AUDC, curve)."""
    import functools

    from mdcommunity_tpu.graphs.banded import apply_severs
    from mdcommunity_tpu.models.net import banded_test_forward

    pks = None
    if variant == "hca":
        if hca_data is None:
            raise ValueError("variant='hca' requires hca_data")
        from mdcommunity_tpu.models.hca_banded import (
            banded_hca_forward,
            banded_hca_forward_packed,
        )

        if packed:
            from mdcommunity_tpu.graphs.banded import (
                apply_severs_packed,
                pack_duplex,
            )

            pks = pack_duplex(banded)

            @functools.partial(jax.jit, static_argnames=("k", "precise"))
            def qfn_hca_pk(params, banded, pks, hd, covered, k, precise=False):
                with _prec_ctx(precise):
                    q = banded_hca_forward_packed(
                        params, banded, pks, hd, covered, precise=precise
                    )
                return jax.lax.top_k(q, k)

            sever_fn_pk = jax.jit(
                apply_severs_packed, static_argnames=("layer",)
            )
        else:

            @functools.partial(jax.jit, static_argnames=("k", "precise"))
            def qfn_hca(params, banded, hd, covered, k, precise=False):
                with _prec_ctx(precise):
                    q = banded_hca_forward(
                        params, banded, hd, covered, precise=precise
                    )
                return jax.lax.top_k(q, k)

            sever_fn = jax.jit(apply_severs, static_argnames=("layer",))
    elif packed:
        from mdcommunity_tpu.graphs.banded import (
            apply_severs_packed,
            pack_duplex,
        )
        from mdcommunity_tpu.models.net_packed import banded_test_forward_packed

        pks = pack_duplex(banded)
        # fused SAGE steps (aggregation + dense layer + l2n in one kernel
        # pass — 1.48x the XLA engine at 2^19, fwd_breakdown.json) whenever
        # the spill sets are empty (locality-ordered builds); static per
        # build, so decided outside the jit
        fuse = all(
            banded.dbg(l).spill.d_src.shape[0] == 0 for l in range(2)
        )

        # device-side top-k: fetch only `step` (value, index) pairs instead
        # of the full [pad_n] Q vector (4 MB at 2^20 nodes, ~30 ms tunnel
        # RTT) + a host argsort per removal
        @functools.partial(
            jax.jit,
            static_argnames=("variant", "k", "interpret", "fuse", "precise"),
        )
        def qfn_pk(params, banded, pks, covered, variant, k, interpret=None,
                   fuse=False, precise=False):
            with _prec_ctx(precise):
                q = banded_test_forward_packed(
                    params, banded, pks, covered, variant=variant,
                    interpret=interpret, fuse_sage=fuse, precise=precise,
                )
            return jax.lax.top_k(q, k)

        sever_fn_pk = jax.jit(apply_severs_packed, static_argnames=("layer",))
    else:

        @functools.partial(
            jax.jit, static_argnames=("variant", "k", "precise")
        )
        def qfn(params, banded, covered, variant, k, precise=False):
            with _prec_ctx(precise):
                q = banded_test_forward(
                    params, banded, covered, variant=variant, precise=precise
                )
            return jax.lax.top_k(q, k)

        sever_fn = jax.jit(apply_severs, static_argnames=("layer",))

    pad_n = banded.pad_n
    n = env.n
    max_steps = max_steps or n
    sol: List[int] = []

    def pad_pow2(k: int) -> int:
        p = 8
        while p < k:
            p *= 2
        return p

    def apply(banded, layer, ns):
        nonlocal pks
        # CHUNK large sever batches: sever_edges' overflow matching
        # materializes an O(E_ov x K) pairwise bool matrix, and the t=0
        # cascade of a 10^6-node duplex can sever 10^5+ edges at once — one
        # unchunked call allocated multiple GB and crashed the TPU worker
        # (observed at the 1M-node demo).  The chunk adapts to the overflow
        # size (mirror + spill edges) so the match stays <= ~2^27 elements
        # even for badly-banded graphs where E_spill itself is 10^5+.
        dbg_l = banded.dbg(layer)
        e_ov = int(dbg_l.w_cov.shape[0]) + int(dbg_l.w_spill.shape[0])
        # no floor above 1: a 64-row floor would re-admit >2^27-element
        # matches for e_ov > 2^21 (ADVICE r3) — pathological graphs just pay
        # more sever calls instead
        CHUNK = max(1, min(8192, (1 << 27) // max(e_ov, 1)))
        for c0 in range(0, len(ns), CHUNK):
            part = ns[c0 : c0 + CHUNK]
            k = pad_pow2(len(part))
            s = np.zeros(k, np.int32)
            d = np.zeros(k, np.int32)
            v = np.zeros(k, bool)
            s[: len(part)] = part[:, 0]
            d[: len(part)] = part[:, 1]
            v[: len(part)] = True
            s, d, v = jnp.asarray(s), jnp.asarray(d), jnp.asarray(v)
            if packed:
                banded, pks = sever_fn_pk(banded, pks, layer, s, d, v)
            else:
                banded = sever_fn(banded, layer, s, d, v)
        return banded

    # sync the band with any edges the env has already severed (the t=0
    # cascade usually severs some — the two layers' partitions rarely agree)
    for layer in range(2):
        ns = env.edges[layer][env.sever[layer]]
        if len(ns):
            banded = apply(banded, layer, ns)

    # covered stays DEVICE-RESIDENT: the host env only ever covers the chosen
    # node (host_env.step :155), so after the initial upload each removal is a
    # single-index .at[].set instead of re-uploading the [pad_n] mask
    covered_dev = jnp.asarray(
        np.pad(env.covered, (0, pad_n - n), constant_values=True)
    )
    cover_one = jax.jit(lambda c, a: c.at[a].set(True))

    def q_dispatch(banded, pks, covered, k):
        if variant == "hca" and packed:
            return qfn_hca_pk(
                params, banded, pks, hca_data, covered, k=k, precise=precise
            )
        if variant == "hca":
            return qfn_hca(
                params, banded, hca_data, covered, k=k, precise=precise
            )
        if packed:
            return qfn_pk(
                params, banded, pks, covered, variant=variant, k=k,
                fuse=fuse, precise=precise,
            )
        return qfn(params, banded, covered, variant=variant, k=k,
                   precise=precise)

    if step == 1 and not batch_env:
        # StepRatio-0 fast path: ONE device call per removal applies both
        # layers' severs + covers the node + runs the next forward + top-1,
        # and the (value, index) pair comes back as ONE array so the loop
        # blocks on a single fetch.  Per-removal wall time on the tunnel is
        # RTT-bound (~25 ms per blocking round trip); the generic loop below
        # costs 2 fetches + 2-4 dispatches per removal.  The sever pad is a
        # single fixed bucket (1024) so the step compiles exactly once —
        # per-shape buckets cost a ~40 s tunnel compile EACH.
        SEVER_PAD = 1024
        fused_step = _make_fused_step(
            variant, packed, fuse if packed and variant != "hca" else False,
            precise,
        )

        pks_arg = pks if pks is not None else ()
        vals, order = q_dispatch(banded, pks_arg if packed else pks,
                                 covered_dev, step)
        vo = np.stack([np.asarray(vals), np.asarray(order).astype(np.float32)])
        while not env.terminal and len(sol) < max_steps:
            v = float(vo[0, 0])
            a = int(vo[1, 0])
            if not np.isfinite(v) or env.covered[a]:
                break
            _, new_sev = env.step(a, degree_cost=(variant == "degree_cost"))
            sol.append(a)
            if env.terminal or len(sol) >= max_steps:
                break
            if any(len(new_sev[layer]) > SEVER_PAD for layer in range(2)):
                # huge cascade report (t~0 of a badly coupled graph): the
                # chunked sever path guards the O(E_ov x K) match size
                for layer in range(2):
                    if len(new_sev[layer]):
                        banded = apply(banded, layer, new_sev[layer])
                covered_dev = cover_one(covered_dev, a)
                if packed:
                    pks_arg = pks  # apply() updated pks via nonlocal
                vals, order = q_dispatch(
                    banded, pks_arg if packed else None, covered_dev, step
                )
                vo = np.stack(
                    [np.asarray(vals), np.asarray(order).astype(np.float32)]
                )
                continue
            buf = np.zeros((2, 3, SEVER_PAD + 1), np.int32)
            for layer in range(2):
                ns = new_sev[layer]
                buf[layer, 0, : len(ns)] = ns[:, 0]
                buf[layer, 1, : len(ns)] = ns[:, 1]
                buf[layer, 2, : len(ns)] = 1
            buf[0, 0, -1] = a
            banded, pks_arg, covered_dev, vo_dev = fused_step(
                params, banded, pks_arg, hca_data, covered_dev,
                jnp.asarray(buf), k=step,
            )
            vo = np.asarray(vo_dev)
            if packed:
                pks = pks_arg
        return sol, float(env.score), list(env.curve)

    while not env.terminal and len(sol) < max_steps:
        if variant == "hca" and packed:
            vals, order = qfn_hca_pk(
                params, banded, pks, hca_data, covered_dev, k=step,
                precise=precise,
            )
        elif variant == "hca":
            vals, order = qfn_hca(
                params, banded, hca_data, covered_dev, k=step, precise=precise
            )
        elif packed:
            vals, order = qfn_pk(
                params, banded, pks, covered_dev, variant=variant, k=step,
                fuse=fuse, precise=precise,
            )
        else:
            vals, order = qfn(
                params, banded, covered_dev, variant=variant, k=step,
                precise=precise,
            )
        vals, order = np.asarray(vals), np.asarray(order)
        if batch_env and step > 1:
            # ONE cascade for the whole StepRatio batch (see docstring);
            # keep the valid PREFIX of the top-k, like the sequential loop
            ok = np.isfinite(vals) & ~env.covered[order]
            cut = int(np.argmin(ok)) if not ok.all() else len(ok)
            acts = order[:cut][: max_steps - len(sol)]
            if len(acts) == 0:
                break
            _, new_sev, removed = env.step_many(
                acts, degree_cost=(variant == "degree_cost")
            )
            sol.extend(int(a) for a in acts)
            covered_dev = cover_one(covered_dev, jnp.asarray(acts))
            for layer in range(2):
                if len(new_sev[layer]):
                    banded = apply(banded, layer, new_sev[layer])
            continue
        for v, a in zip(vals, order):
            if env.terminal or len(sol) >= max_steps:
                break
            if not np.isfinite(v) or env.covered[a]:
                break
            _, new_sev = env.step(int(a), degree_cost=(variant == "degree_cost"))
            sol.append(int(a))
            covered_dev = cover_one(covered_dev, int(a))
            for layer in range(2):
                if len(new_sev[layer]):
                    banded = apply(banded, layer, new_sev[layer])
    return sol, float(env.score), list(env.curve)
