"""End-to-end DQN training ON a 10^6-node banded duplex (round 5).

This is the reference `Train()` loop (MultiDismantler_torch.py:433-547:
rollout -> n-step transitions -> fit -> target-net snapshot -> validation)
lifted to the scale the reference could never touch (its largest committed
run is N=18,222, eval-only).  The adaptation to 10^6 nodes is the same one
the large-graph EVAL path already makes (eval/metrics.py batch_env): the
unit of interaction is a StepRatio macro-step — the policy ranks all nodes,
the top-k (eps-mixed) are removed together, and ONE host cascade advances
the environment.  Accordingly:

* A transition is (s_t, A_t, r_t, s_{t+1}) with A_t the k actions of the
  macro-step and r_t the per-action reward the batched env assigns
  (-norm_post * cost(a), exactly `step_many`'s curve/score contract —
  host_env.py:170-192).
* The TD target for every a in A_t is r_t(a) + gamma * max_a' Q_target
  (s_{t+1}, a') (0 at terminal).  One macro-step spans k >> n_step
  single removals, so the reference's 5-removal n-step return is the
  degenerate n=1 case at macro granularity.
* The replay buffer degenerates to the episode stream: at this scale the
  state (the severed band operands, ~GBs) IS the storage cost, so
  transitions are fitted in rollout order while their pre-step operands
  are still device-resident — each macro-step is one fit batch of k
  state-action pairs (fits_per_step repeats it).  The 30-50-node trainer
  (rl/dqn.py) keeps the reference's full bit-packed n-step replay.
* Target-network snapshots every `target_update` fits and eps-greedy
  exploration (per-slot eps mixing over the valid-action set,
  mvc_env.randomAction:89-101 semantics) are unchanged from the reference.

The device side is the production large-graph stack: packed Pallas band
forward for action selection / targets (models/net_packed.py), XLA
dense-band engine for the differentiable fit (models/net.banded_train_loss
— MSE + Laplacian regularizer, calc_loss parity), both on the same
BandedDuplex operands; `mesh=...` runs every aggregation gp-sharded
(parallel/band_partition), which __graft_entry__.dryrun_multichip uses to
verify the WHOLE loop multi-chip (loss-trajectory parity vs single device).
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


_SEVER_JIT = {}


def _sever_jit(packed):
    """Cached jitted sever appliers (a fresh jax.jit wrapper per call would
    retrace every time — each retrace is a multi-10s tunnel compile)."""
    if packed not in _SEVER_JIT:
        from mdcommunity_tpu.graphs.banded import (
            apply_severs,
            apply_severs_packed,
        )

        fn = apply_severs_packed if packed else apply_severs
        _SEVER_JIT[packed] = jax.jit(fn, static_argnames=("layer",))
    return _SEVER_JIT[packed]


def _apply_severs_chunked(banded, pks, layer, ns, packed):
    """Sever edge list `ns` [K, 2] in both operand layouts, chunked so the
    O(E_ov x K) overflow match stays <= 2^27 elements (the t=0 cascade of a
    10^6-node duplex severs 10^4+ edges at once; an unchunked call crashed
    the TPU worker — eval/metrics.py carries the same guard)."""
    dbg_l = banded.dbg(layer)
    e_ov = int(dbg_l.w_cov.shape[0]) + int(dbg_l.w_spill.shape[0])
    chunk = max(1, min(8192, (1 << 27) // max(e_ov, 1)))
    fn = _sever_jit(packed)
    for c0 in range(0, len(ns), chunk):
        part = ns[c0:c0 + chunk]
        k = 8
        while k < len(part):
            k *= 2
        s = np.zeros(k, np.int32)
        d = np.zeros(k, np.int32)
        v = np.zeros(k, bool)
        s[:len(part)] = part[:, 0]
        d[:len(part)] = part[:, 1]
        v[:len(part)] = True
        s, d, v = jnp.asarray(s), jnp.asarray(d), jnp.asarray(v)
        if packed:
            banded, pks = fn(banded, pks, layer, s, d, v)
        else:
            banded = fn(banded, layer, s, d, v)
    return banded, pks


def sync_env_severs(banded, pks, env, packed):
    """Replay the env's CURRENT persistent sever masks into the band
    operands (used at episode start: the t=0 cascade usually severs some
    edges before any removal)."""
    for layer in range(2):
        ns = env.edges[layer][env.sever[layer]]
        if len(ns):
            banded, pks = _apply_severs_chunked(banded, pks, layer, ns, packed)
    return banded, pks


def train_banded_loop(
    params,
    banded0,
    env,
    *,
    iters: int = 600,
    k: int = 1024,
    variant: str = "unit_cost",
    lr: float = 1e-4,
    gamma: float = 1.0,
    alpha_recon: float = 1e-3,
    eps_start: float = 0.1,
    eps_end: float = 0.02,
    target_update: int = 100,
    fits_per_step: int = 1,
    stop_rank_sqrt: bool = True,
    packed: bool = True,
    precise: bool = True,
    pack_G: int = 8,
    mesh=None,
    interpret: Optional[bool] = None,
    seed: int = 0,
    log=print,
    log_every: int = 25,
):
    """Train `params` by dismantling the single large duplex `env` holds.

    banded0: pristine BandedDuplex in the env's (band) node order — episode
    resets re-derive the working operands from it.  Returns (params,
    history) where history is a list of per-iteration dicts (loss, norm,
    eps, wall time) plus per-episode AUDC rows — the 10^6-scale learning
    curve artifact.

    mesh: run gp-sharded — banded0/pks and the covered vector must already
    be sharded by the caller (parallel.band_partition.shard_* helpers);
    actions/targets stay replicated.  The host env side is unchanged.

    stop_rank_sqrt: end the training episode once rank <= sqrt(N) — the
    reference's own synthetic stopping rule (hda_2max_syn.py:78-81).  The
    first naive 2^20 run (train1m_n1048576_naive.jsonl) showed why this
    matters at macro scale: past rank collapse the episode spends ~60% of
    its iterations in a degenerate tail (norm ~ 0, rewards ~ 0) where the
    TD targets reduce to pure bootstrap — max-Q inflated 0.03 -> 0.16 over
    350 such fits and the fine-tuned policy got 6x WORSE on greedy eval.
    Stopping at the sqrt(N) rank keeps every fit on states the eval
    protocol actually visits.
    """
    from mdcommunity_tpu.models.net import banded_test_forward, banded_train_loss

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(seed)
    n = env.n
    pad_n = banded0.pad_n

    pks0 = None
    if packed:
        from mdcommunity_tpu.graphs.banded import pack_duplex
        from mdcommunity_tpu.models.net_packed import banded_test_forward_packed

        pks0 = pack_duplex(banded0, G=pack_G)
        fuse = all(
            banded0.dbg(l).spill.d_src.shape[0] == 0 for l in range(2)
        ) and mesh is None
    if mesh is not None:
        # caller passes the UNSHARDED pristine build; everything device-
        # resident is placed on the gp axis here (operands block-sharded,
        # node vectors gp-sharded, params/actions/targets replicated)
        from mdcommunity_tpu.graphs.banded import shard_banded_duplex
        from mdcommunity_tpu.parallel.band_partition import shard_packed_band

        for l in range(2):
            if banded0.dbg(l).spill.d_src.shape[0]:
                raise ValueError(
                    "gp-sharded training requires a zero-spill band build "
                    "(the sharded engines carry band + mirror only; "
                    "graphs/ordering.py's seriation gets real graphs there "
                    "— rebuild with a larger mirror cap or better order)"
                )

        banded0 = shard_banded_duplex(mesh, banded0)
        if packed:
            pks0 = (
                shard_packed_band(mesh, pks0[0]),
                shard_packed_band(mesh, pks0[1]),
            )
    if packed:

        @partial(jax.jit, static_argnames=("kk",))
        def qtop(p, b, k0, k1, cov, kk):
            with jax.default_matmul_precision("highest" if precise else
                                              "default"):
                q = banded_test_forward_packed(
                    p, b, (k0, k1), cov, variant=variant,
                    interpret=interpret or None, fuse_sage=fuse,
                    precise=precise, mesh=mesh,
                )
            return jax.lax.top_k(q, kk)
    else:

        @partial(jax.jit, static_argnames=("kk",))
        def qtop(p, b, k0, k1, cov, kk):
            del k0, k1
            with jax.default_matmul_precision("highest" if precise else
                                              "default"):
                q = banded_test_forward(
                    p, b, cov, variant=variant, precise=precise
                )
            return jax.lax.top_k(q, kk)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def _loss(p, b, cov, acts, tgts):
        with jax.default_matmul_precision("highest" if precise else
                                          "default"):
            # remat: at 10^6 nodes the stored fwd residuals of the embed's
            # aggregation passes OOM the chip next to the resident band
            # operands; the passes are DMA-bound, so recompute is cheap
            return banded_train_loss(
                p, b, cov, acts, tgts, alpha=alpha_recon, variant=variant,
                precise=precise, mesh=mesh, remat=True,
            )

    @jax.jit
    def fit_step(p, os_, b, cov, acts, tgts):
        loss, grads = jax.value_and_grad(_loss)(p, b, cov, acts, tgts)
        updates, os2 = opt.update(grads, os_)
        return optax.apply_updates(p, updates), os2, loss

    cover_many = jax.jit(lambda c, a: c.at[a].set(True))

    # per-action reward factors (step_many's score contract)
    if variant == "degree_cost":
        w = np.asarray(banded0.weights)[:, :n]
        cost = 0.5 * (w[0] / max(w[0].sum(), 1e-9)
                      + w[1] / max(w[1].sum(), 1e-9))
    else:
        cost = np.full(n, 1.0 / n)

    def reset_episode():
        env.reset()
        b, p_ = sync_env_severs(banded0, pks0, env, packed)
        cov = jnp.asarray(np.pad(env.covered, (0, pad_n - n),
                                 constant_values=True))
        if mesh is not None:
            from mdcommunity_tpu.parallel.band_partition import (
                shard_band_vectors,
            )

            cov = shard_band_vectors(mesh, cov)
        return b, p_, cov

    banded, pks, covered = reset_episode()
    target_params = params
    history: List[dict] = []
    episode = 0
    t_loop = time.perf_counter()

    for it in range(iters):
        t0 = time.perf_counter()
        eps = eps_start + (eps_end - eps_start) * it / max(iters - 1, 1)

        # --- action selection: device top-k, host eps mixing ------------
        vals, order = qtop(params, banded, pks[0] if packed else None,
                           pks[1] if packed else None, covered, kk=k)
        vals = np.asarray(vals)
        order = np.asarray(order)
        ok = np.isfinite(vals) & ~env.covered[order]
        cut = int(np.argmin(ok)) if not ok.all() else len(ok)
        acts = order[:cut].astype(np.int64)
        if len(acts) == 0:
            # no live action (the forward masks dead nodes to -inf)
            banded, pks, covered = reset_episode()
            episode += 1
            continue
        mix = rng.random(len(acts)) < eps
        if mix.any():
            valid = env.alive_nodes(0) & env.alive_nodes(1) & ~env.covered
            valid[acts[~mix]] = False  # keep the batch duplicate-free
            # (only the KEPT actions are excluded: at eps=1 the pool is then
            # independent of Q ordering, which the dryrun's trajectory-
            # parity contract relies on)
            pool = np.flatnonzero(valid)
            n_mix = min(int(mix.sum()), len(pool))
            if n_mix:
                repl = rng.choice(pool, size=n_mix, replace=False)
                acts[np.flatnonzero(mix)[:n_mix]] = repl

        # --- env macro-step (ONE cascade), rewards ----------------------
        _, new_sev, removed = env.step_many(
            acts, degree_cost=(variant == "degree_cost")
        )
        norm = env.rank / max(env.max_rank, 1)
        rewards = -norm * cost[acts]

        # --- next state on device ---------------------------------------
        prev_banded, prev_pks, prev_covered = banded, pks, covered
        covered = cover_many(covered, jnp.asarray(acts))
        for layer in range(2):
            if len(new_sev[layer]):
                banded, pks = _apply_severs_chunked(
                    banded, pks, layer, new_sev[layer], packed
                )

        # --- TD targets --------------------------------------------------
        if env.terminal:
            targets = rewards
            maxq = 0.0
        else:
            tv, _ = qtop(target_params, banded,
                         pks[0] if packed else None,
                         pks[1] if packed else None, covered, kk=1)
            maxq = float(np.asarray(tv)[0])
            targets = rewards + gamma * maxq

        # --- fit on the pre-step state (k state-action pairs) ------------
        loss_v = float("nan")
        if len(acts) == k:  # skip the rare short terminal batch: a new
            # action shape would trigger a fresh (multi-10s) tunnel compile
            acts_dev = jnp.asarray(acts.astype(np.int32))
            tgts_dev = jnp.asarray(targets.astype(np.float32))
            for _ in range(fits_per_step):
                params, opt_state, loss = fit_step(
                    params, opt_state, prev_banded, prev_covered,
                    acts_dev, tgts_dev,
                )
            loss_v = float(loss)
        del prev_banded, prev_pks, prev_covered

        if (it + 1) % target_update == 0:
            target_params = params

        row = {
            "iter": it, "episode": episode, "eps": round(float(eps), 4),
            "removed": int(removed), "norm": round(float(norm), 6),
            "maxq": round(float(maxq), 6), "loss": loss_v,
            "t_iter_s": round(time.perf_counter() - t0, 3),
        }
        history.append(row)
        if it % log_every == 0 or env.terminal:
            log(f"[big] it {it} ep {episode} eps {eps:.3f} "
                f"norm {norm:.4f} loss {loss_v:.3e} maxq {maxq:.4f} "
                f"t {row['t_iter_s']:.2f}s")

        ep_done = env.terminal or (
            stop_rank_sqrt and env.rank * env.rank <= n
        )
        if ep_done:
            history.append({
                "episode_end": episode, "audc": float(env.score),
                "removals": int(env.t), "iters_used": it + 1,
                "terminal": bool(env.terminal), "rank": int(env.rank),
            })
            log(f"[big] episode {episode} done (terminal={env.terminal}, "
                f"rank={env.rank}): AUDC {env.score:.6f} "
                f"({env.t} removals)")
            banded, pks, covered = reset_episode()
            episode += 1

    history.append({
        "total_wall_s": round(time.perf_counter() - t_loop, 1),
        "iters": iters, "episodes": episode + 1,
    })
    return params, history
