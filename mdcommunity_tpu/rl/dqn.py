"""The DQN agent: vectorized rollouts, jitted fitting, validation, checkpoints.

Reference: class MultiDismantler (MultiDismantler_torch.py).  Structural map:

  Train                :433-547   -> DQNAgent.train (same schedule: regen pool /
                                     play / validate / snapshot / fit cadence)
  Run_simulator        :183-208   -> DQNAgent.play_games — but over a *vector* of
                                     num_env environments stepped on device
                                     (reference: num_env=1, Python loop)
  Predict/SetuppredAll :247-302   -> predict_q (jit: batch assembly + forward)
  Fit/fit/calc_loss    :315-431   -> train_step (jit: target + loss + adam)
  TakeSnapShot         :312-313   -> target_params <- params
  Test                 :738-755   -> validate (all validation envs rolled out in
                                     one batched greedy sweep)
  SaveModel/LoadModel  :787-797   -> save / load (full training state: params,
                                     target, optimizer, RNG — true resume,
                                     unlike the reference's weights-only ckpt)

Epsilon schedule: eps_end + max(0, (eps_start-eps_end)·(eps_step-iter)/eps_step
(reference :501).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mdcommunity_tpu.env.batch import make_batch_inputs
from mdcommunity_tpu.env.env import EnvState, batched_reset, batched_step
from mdcommunity_tpu.graphs.duplex import (
    DuplexGraph,
    EpochGraphRing,
    GraphPool,
    index_graphs,
)
from mdcommunity_tpu.graphs.gmm import generate_pool
from mdcommunity_tpu.models.net import (
    init_params,
    laplacian_regularizer,
    param_count,
    test_forward,
    train_forward,
)
from mdcommunity_tpu.utils.config import Config
from mdcommunity_tpu.utils.profiling import ThroughputMeter, device_timer


# ---------------------------------------------------------------------------
# jitted compute
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("variant", "dense", "max_bp_iter"))
def predict_q(params, g: DuplexGraph, covered, sever, variant="unit_cost",
              dense=True, max_bp_iter=3):
    """Batched Q(s, ·) with dead/covered nodes at -inf (reference Predict)."""
    if variant == "hca":
        from mdcommunity_tpu.models.hca import hca_forward, make_hca_inputs

        inputs = make_hca_inputs(g, covered, sever, c_pad=g.pad_n)
        q, _ = hca_forward(params, g, inputs, max_bp_iter=max_bp_iter)
        return q
    inputs = make_batch_inputs(g, covered, sever, dense=dense, variant=variant)
    return test_forward(params, g, inputs, max_bp_iter=max_bp_iter)


@partial(
    jax.jit,
    static_argnames=("variant", "gamma", "alpha_recon", "use_double_dqn",
                     "use_huber", "max_bp_iter", "optimizer"),
)
def train_step(
    params,
    target_params,
    opt_state,
    g: DuplexGraph,
    covered_st,
    sever_st,
    actions,
    rewards,
    covered_sp,
    sever_sp,
    terminal,
    is_weights=None,
    variant="unit_cost",
    gamma=1.0,
    alpha_recon=1e-3,
    use_double_dqn=False,
    use_huber=False,
    max_bp_iter=3,
    optimizer=None,
):
    """One SGD step (reference Fit -> fit -> calc_loss, :315-431)."""
    if variant == "hca":
        from mdcommunity_tpu.models.hca import (
            hca_forward,
            hca_laplacian,
            make_hca_inputs,
        )

        inputs_sp = make_hca_inputs(g, covered_sp, sever_sp, c_pad=g.pad_n)
        inputs_st = make_hca_inputs(g, covered_st, sever_st, c_pad=g.pad_n)

        def q_all_fn(p, inputs):
            return hca_forward(p, g, inputs, max_bp_iter=max_bp_iter)

        bidx = jnp.arange(actions.shape[0])

        q_sp_t, _ = q_all_fn(target_params, inputs_sp)
        if use_double_dqn:
            q_sp_o, _ = q_all_fn(params, inputs_sp)
            a_star = jnp.argmax(q_sp_o, axis=1)
            max_q = jnp.take_along_axis(q_sp_t, a_star[:, None], axis=1)[:, 0]
        else:
            max_q = jnp.max(q_sp_t, axis=1)
        max_q = jnp.where(terminal, 0.0, max_q)
        target = jax.lax.stop_gradient(rewards + gamma * max_q)

        iw = jnp.ones_like(target) if is_weights is None else is_weights

        def loss_fn(p):
            q_all, h_f = q_all_fn(p, inputs_st)
            q = q_all[bidx, actions]
            if use_huber:
                mse = jnp.mean(iw * optax.huber_loss(q, target, delta=1.0))
            else:
                mse = jnp.mean(iw * (target - q) ** 2)
            recon = hca_laplacian(h_f, g, inputs_st)
            return mse + alpha_recon * recon, (mse, recon, target - q)

        (loss, (mse, recon, td)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, mse, recon, td

    inputs_sp = make_batch_inputs(g, covered_sp, sever_sp, dense=True, variant=variant)
    q_sp_t = test_forward(target_params, g, inputs_sp, max_bp_iter=max_bp_iter)
    if use_double_dqn:
        q_sp_o = test_forward(params, g, inputs_sp, max_bp_iter=max_bp_iter)
        a_star = jnp.argmax(q_sp_o, axis=1)
        max_q = jnp.take_along_axis(q_sp_t, a_star[:, None], axis=1)[:, 0]
    else:
        max_q = jnp.max(q_sp_t, axis=1)
    max_q = jnp.where(terminal, 0.0, max_q)
    target = rewards + gamma * max_q
    target = jax.lax.stop_gradient(target)

    inputs_st = make_batch_inputs(g, covered_st, sever_st, dense=True, variant=variant)

    iw = jnp.ones_like(target) if is_weights is None else is_weights

    def loss_fn(p):
        q, h_f = train_forward(p, g, inputs_st, actions, max_bp_iter=max_bp_iter)
        if use_huber:
            mse = jnp.mean(iw * optax.huber_loss(q, target, delta=1.0))
        else:
            mse = jnp.mean(iw * (target - q) ** 2)
        recon = laplacian_regularizer(h_f, g, inputs_st)
        return mse + alpha_recon * recon, (mse, recon, target - q)

    (loss, (mse, recon, td)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, mse, recon, td


@partial(jax.jit, static_argnames=("tau",))
def _batched_bridge_bonus(g, state, actions, tau=0.5):
    from mdcommunity_tpu.env.env import hca_bridge_bonus

    return jax.vmap(lambda gg, ss, aa: hca_bridge_bonus(gg, ss, aa, tau))(
        g, state, actions
    )


def _pack_bits_u8(x: jnp.ndarray) -> jnp.ndarray:
    """bool[..., M] (M % 8 == 0) -> uint8[..., M//8], np.packbits-compatible
    (MSB first), so the host can np.unpackbits the transferred history."""
    b = x.reshape(x.shape[:-1] + (x.shape[-1] // 8, 8)).astype(jnp.int32)
    w = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    return (b * w).sum(-1).astype(jnp.uint8)


@partial(
    jax.jit,
    static_argnames=("n_steps", "variant", "degree_cost", "ce_prune",
                     "hca_bridge", "hca_beta", "hca_tau"),
)
def rollout_autoreset(
    params,
    pool_g: DuplexGraph,
    pool_s0: EnvState,
    gids,
    g: DuplexGraph,
    state: EnvState,
    key,
    eps,
    gid_lo=0,
    gid_hi=None,
    n_steps: int = 8,
    variant: str = "unit_cost",
    degree_cost: bool = False,
    ce_prune: bool = False,
    hca_bridge: bool = False,
    hca_beta: float = 0.5,
    hca_tau: float = 0.5,
):
    """n_steps eps-greedy env steps as ONE device program (lax.scan) with
    device-side episode auto-reset: when an env goes terminal it immediately
    draws a fresh pool graph and its precomputed t=0 state (pool_s0 — the reset
    cascade runs ONCE per pool, not once per episode), so every step of every
    env produces useful experience and the host never drives resets.  The whole
    history comes back in a single transfer (severed-edge masks bit-packed:
    through the TPU relay each round trip is ~30 ms and bandwidth is scarce);
    the host slices episodes out of it (play_games).

    Resets sample gids uniformly from [gid_lo, gid_hi) — the current-epoch
    window of an EpochGraphRing (dynamic scalars: no recompile per epoch);
    defaults cover a plain stacked pool.

    Returns ((gids, g, state) carry, history dict of [n_steps, B, ...] arrays).
    """
    from mdcommunity_tpu.env.env import batched_random_actions

    if gid_hi is None:
        gid_hi = pool_g.node_mask.shape[0]

    def step(carry, key_s):
        gids, g, state = carry
        kq, ka, kg = jax.random.split(key_s, 3)
        q = predict_q(params, g, state.covered, state.sever, variant)
        if ce_prune:
            from mdcommunity_tpu.env.env import prune_q_to_boundary

            q = prune_q_to_boundary(q, g.boundary)
        greedy = jnp.argmax(q, axis=1)
        rand = batched_random_actions(g, state, ka, boundary_first=ce_prune)
        # one exploration draw for the whole vector of envs per step,
        # as in the reference's Run_simulator (:200-208)
        actions = jnp.where(jax.random.uniform(kq) >= eps, greedy, rand)
        if hca_bridge:
            bonus = _batched_bridge_bonus(g, state, actions, hca_tau)
        else:
            bonus = 0.0
        valid = ~state.terminal  # False only for an s0-terminal fresh graph
        new_state, rewards = batched_step(g, state, actions, degree_cost)
        rewards = rewards + (hca_beta * bonus if hca_bridge else 0.0)
        done = new_state.terminal
        out = dict(
            gid=gids,
            actions=actions,
            rewards=rewards,
            covered=new_state.covered,
            sever=_pack_bits_u8(
                new_state.sever.reshape(new_state.sever.shape[0], -1)
            ),
            valid=valid,
            done=done,
        )
        # auto-reset: finished envs draw a fresh uniform current-pool graph
        new_gids = jax.random.randint(kg, gids.shape, gid_lo, gid_hi)
        gids = jnp.where(done, new_gids, gids)
        g = jax.tree_util.tree_map(lambda pl: pl[gids], pool_g)
        state = jax.tree_util.tree_map(
            lambda s0, cur: jnp.where(
                done.reshape((-1,) + (1,) * (cur.ndim - 1)), s0[gids], cur
            ),
            pool_s0,
            new_state,
        )
        return (gids, g, state), out

    keys = jax.random.split(key, n_steps)
    carry, hist = jax.lax.scan(step, (gids, g, state), keys)
    return carry, hist


@partial(
    jax.jit,
    static_argnames=("variant", "ce_prune", "degree_cost", "max_steps"),
)
def greedy_rollout(
    params,
    g: DuplexGraph,
    state: EnvState,
    variant: str = "unit_cost",
    ce_prune: bool = False,
    degree_cost: bool = False,
    max_steps: int = 0,
):
    """Roll every env to terminal with greedy argmax actions as ONE device
    program (lax.while_loop) — the validation sweep (reference Test :738-755)
    without a host round trip per step."""
    max_steps = max_steps or g.node_mask.shape[-1]

    def cond(carry):
        state, step = carry
        return (step < max_steps) & ~jnp.all(state.terminal)

    def body(carry):
        state, step = carry
        q = predict_q(params, g, state.covered, state.sever, variant)
        if ce_prune:
            from mdcommunity_tpu.env.env import prune_q_to_boundary

            q = prune_q_to_boundary(q, g.boundary)
        actions = jnp.argmax(q, axis=1)
        state, _ = batched_step(g, state, actions, degree_cost)
        return state, step + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state


# ---------------------------------------------------------------------------
# the agent
# ---------------------------------------------------------------------------

class DQNAgent:
    """mesh: optional jax.sharding.Mesh with a 'dp' axis — replay batches,
    rollout envs, and validation graphs are sharded over it and params
    replicated, so fit/rollout/validate run data-parallel across chips with
    XLA inserting the gradient all-reduce (parallel/mesh.py; multi-host via
    parallel.mesh.init_distributed())."""

    def __init__(self, cfg: Config, seed: Optional[int] = None, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        if cfg.dtype == "bfloat16":
            # keep f32 params/activations but run MXU passes at bf16 rate.
            # On TPU this is the explicit spelling of the DEFAULT (f32
            # matmuls already execute as single-pass bf16 on the MXU —
            # 4k-iter curves are bit-identical either way), validated
            # against precision=highest true-f32 training on-chip: same
            # quality band (RESULTS.md "bf16 training validation",
            # models_tpu/unit_cost_{bf16,f32hi}_tpu4k).
            jax.config.update("jax_default_matmul_precision", "bfloat16")
        seed = cfg.seed if seed is None else seed
        self.nprng = np.random.default_rng(seed)
        key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(key)
        if cfg.variant == "hca":
            from mdcommunity_tpu.models.hca import init_hca_params

            self.params = init_hca_params(
                init_key,
                embedding_size=cfg.embedding_size,
                reg_hidden=cfg.reg_hidden,
                aux_dim=cfg.aux_dim,
                gate_hidden=cfg.gate_hidden,
                w_init_std=cfg.w_init_std,
            )
        else:
            self.params = init_params(
                init_key,
                embedding_size=cfg.embedding_size,
                reg_hidden=cfg.reg_hidden,
                aux_dim=cfg.aux_dim,
                node_feat_dim=cfg.node_feat_dim,
                gate_hidden=cfg.gate_hidden,
                w_init_std=cfg.w_init_std,
                fusion=cfg.fusion,
            )
        self.target_params = jax.tree_util.tree_map(jnp.copy, self.params)
        self.optimizer = optax.adam(cfg.learning_rate)
        self.opt_state = self.optimizer.init(self.params)

        if cfg.use_prioritized:
            from mdcommunity_tpu.rl.replay_prioritized import PrioritizedNStepReplay

            self.replay = PrioritizedNStepReplay(
                cfg.memory_size, cfg.pad_nodes, cfg.pad_edges, cfg.n_step
            )
        else:
            from mdcommunity_tpu.rl.replay import NStepReplay

            self.replay = NStepReplay(
                cfg.memory_size, cfg.pad_nodes, cfg.pad_edges, cfg.n_step
            )
        self.train_pool = EpochGraphRing(cfg.pool_ring_epochs)
        self.valid_pool = GraphPool()
        self.iteration = 0
        self._env_state: Optional[EnvState] = None
        self._env_gids: Optional[np.ndarray] = None
        self._env_graphs: Optional[DuplexGraph] = None
        self._traj: List[dict] = []
        self._pending_prio = None  # deferred (tree_idx, td-device) pair

    # -- data ----------------------------------------------------------------
    @property
    def degree_cost(self) -> bool:
        return self.cfg.variant == "degree_cost"

    @property
    def _prior_feature(self) -> str:
        if self.cfg.variant == "ce":
            return self.cfg.comm_prior_feature
        if self.cfg.variant == "hca":
            return "hca"
        return "none"

    def gen_new_graphs(self):
        """Refresh the training pool (reference gen_new_graphs :151-160).

        Installs the fresh pool as a new EpochGraphRing epoch — previous
        epochs' graphs stay device-resident so replayed transitions keep
        referring to THEIR graphs (the reference stores graph objects in
        replay, nstep_replay_mem.py:43-55)."""
        graphs = generate_pool(
            self.nprng, self.cfg.n_train, self.cfg.num_min, self.cfg.num_max,
            self.cfg.pad_nodes, self.cfg.pad_edges, self.degree_cost,
            self._prior_feature, g_corr=self.cfg.gmm_g,
        )
        self.train_pool.write_epoch(graphs)
        # envs hold ids into the old pool; force re-reset
        self._env_state = None

    def prepare_valid_data(self):
        self.valid_pool.clear()
        for g in generate_pool(
            self.nprng, self.cfg.n_valid, self.cfg.num_min, self.cfg.num_max,
            self.cfg.pad_nodes, self.cfg.pad_edges, self.degree_cost,
            self._prior_feature, g_corr=self.cfg.gmm_g,
        ):
            self.valid_pool.insert(g)

    # -- rollouts -------------------------------------------------------------
    def _reset_envs(self):
        """Full env-vector reset (pool changed / first call).  Mid-training
        episode resets happen on device inside rollout_autoreset."""
        ne = self.cfg.num_env
        self._env_gids = self.train_pool.sample_slots(self.nprng, ne)
        gids = jnp.asarray(self._env_gids)
        self._env_graphs = index_graphs(self.train_pool.stacked, gids)
        self._env_state = jax.tree_util.tree_map(
            lambda x: x[gids], self.train_pool.stacked_s0
        )
        self._traj = [self._new_traj(i) for i in range(ne)]

    def _new_traj(self, i):
        gid = int(self._env_gids[i])
        return {
            "gid": gid,
            "covered": [np.zeros(self.cfg.pad_nodes, bool)],
            "sever": [self.train_pool.s0_sever_host[gid]],
            "actions": [],
            "rewards": [],
        }

    def play_games(self, n_traj: int, eps: float):
        """Collect >= n_traj finished episodes into replay (reference
        Run_simulator).  Each loop turn is ONE device program (auto-resetting
        scan over all envs) + ONE host transfer; with auto-reset every step of
        every env is useful experience, so a single chunk usually finishes
        several episodes and extra ones are kept (more data, same compute)."""
        if len(self.train_pool) == 0:
            self.gen_new_graphs()
        if self._env_state is None:
            self._reset_envs()
        ce_prune = self.cfg.variant == "ce" and self.cfg.action_pruning_train
        hca_bridge = self.cfg.variant == "hca" and self.cfg.hca_bridge_effective
        pool = self.train_pool
        pad_e2 = 2 * self.cfg.pad_edges
        done = 0
        guard = 0
        while done < n_traj and guard < 10000:
            guard += 1
            self.key, k = jax.random.split(self.key)
            (gids, g, state), hist = rollout_autoreset(
                self.params, pool.stacked, pool.stacked_s0,
                jnp.asarray(self._env_gids), self._env_graphs, self._env_state,
                k, jnp.float32(eps),
                gid_lo=jnp.int32(pool.base),
                gid_hi=jnp.int32(pool.base + pool.pool_size),
                n_steps=self.cfg.rollout_chunk,
                variant=self.cfg.variant,
                degree_cost=self.degree_cost,
                ce_prune=ce_prune,
                hca_bridge=hca_bridge,
                hca_beta=self.cfg.hca_beta,
                hca_tau=self.cfg.hca_tau,
            )
            hist, self._env_gids = jax.device_get((hist, gids))
            self._env_graphs, self._env_state = g, state
            sever = np.unpackbits(hist["sever"], axis=-1, count=pad_e2)
            sever = sever.reshape(*sever.shape[:-1], 2, self.cfg.pad_edges).astype(bool)
            n_steps, n_env = hist["actions"].shape
            s0_sever = pool.s0_sever_host
            for s in range(n_steps):
                for i in range(n_env):
                    t = self._traj[i]
                    if hist["valid"][s, i]:
                        t["actions"].append(int(hist["actions"][s, i]))
                        t["rewards"].append(float(hist["rewards"][s, i]))
                        t["covered"].append(hist["covered"][s, i])
                        t["sever"].append(sever[s, i])
                    if hist["done"][s, i]:
                        if t["actions"]:
                            self.replay.add_episode(
                                t["gid"], t["covered"], t["sever"],
                                t["actions"], t["rewards"],
                                graph_epoch=pool.epoch,
                            )
                            done += 1
                        # the device already reset env i to a fresh graph;
                        # next row's gid (or the final carry) names it
                        ngid = int(
                            hist["gid"][s + 1, i] if s + 1 < n_steps
                            else self._env_gids[i]
                        )
                        self._traj[i] = {
                            "gid": ngid,
                            "covered": [np.zeros(self.cfg.pad_nodes, bool)],
                            "sever": [s0_sever[ngid]],
                            "actions": [],
                            "rewards": [],
                        }

    # -- fitting ---------------------------------------------------------------
    def take_snapshot(self):
        self.target_params = jax.tree_util.tree_map(jnp.copy, self.params)

    def fit(self) -> float:
        if self.cfg.use_prioritized:
            pb = self.replay.sample_prioritized(
                self.nprng, self.cfg.batch_size,
                slots_live=self.train_pool.slots_live,
            )
            batch, tree_idx, iw = pb.batch, pb.tree_idx, jnp.asarray(pb.is_weights)
            tree_gen = self.replay.write_gen[tree_idx].copy()
        else:
            batch = self.replay.sample(
                self.nprng, self.cfg.batch_size,
                slots_live=self.train_pool.slots_live,
            )
            tree_idx, iw = None, None
        g = index_graphs(self.train_pool.stacked, jnp.asarray(batch.graph_ids))
        if self.mesh is not None:
            import dataclasses as _dc

            from mdcommunity_tpu.parallel.mesh import replicate, shard_batch

            g = shard_batch(self.mesh, g)
            batch = _dc.replace(
                batch,
                **{
                    f.name: shard_batch(
                        self.mesh, jnp.asarray(getattr(batch, f.name))
                    )
                    for f in _dc.fields(batch)
                },
            )
            if iw is not None:
                iw = shard_batch(self.mesh, iw)
            self.params = replicate(self.mesh, self.params)
            self.target_params = replicate(self.mesh, self.target_params)
            self.opt_state = replicate(self.mesh, self.opt_state)
        self.params, self.opt_state, loss, mse, recon, td = train_step(
            self.params,
            self.target_params,
            self.opt_state,
            g,
            jnp.asarray(batch.covered_st),
            jnp.asarray(batch.sever_st),
            jnp.asarray(batch.actions),
            jnp.asarray(batch.rewards),
            jnp.asarray(batch.covered_sp),
            jnp.asarray(batch.sever_sp),
            jnp.asarray(batch.terminal),
            is_weights=iw,
            variant=self.cfg.variant,
            gamma=self.cfg.gamma,
            alpha_recon=self.cfg.alpha_recon,
            use_double_dqn=self.cfg.use_double_dqn,
            use_huber=self.cfg.use_huber,
            max_bp_iter=self.cfg.max_bp_iter,
            optimizer=self.optimizer,
        )
        if tree_idx is not None:
            # one-step-DEFERRED priority update: fetching this step's td here
            # would fence the dispatch pipeline every iteration; the previous
            # step's td has already finished computing, so its fetch is free.
            # The write-generation snapshot lets the replay skip any slot the
            # ring overwrote between the two fits.
            if self._pending_prio is not None:
                p_idx, p_td, p_gen = self._pending_prio
                self.replay.update_priorities(
                    p_idx, np.asarray(p_td), write_gen=p_gen
                )
            self._pending_prio = (tree_idx, td, tree_gen)
        # device scalar, NOT synced: a float() here would block the dispatch
        # pipeline every iteration (and through the TPU relay costs a ~30 ms
        # round trip); fetch it only where a log line needs the value
        return loss

    # -- evaluation ------------------------------------------------------------
    def validate(self, return_extras: bool = False):
        """Mean normalized dismantling cost over the validation pool: batched
        greedy rollout (reference Test :738-755, score + remaining/(max_rank·N)).

        With return_extras, also returns the CE variant's per-graph LMCC
        diagnostics (reference Test(return_lmcc=True) :913-951): lmcc_final =
        final rank/max_rank, audc = mean of the per-step normalized-LMCC curve."""
        g = self.valid_pool.stacked
        if self.mesh is not None:
            from mdcommunity_tpu.parallel.mesh import replicate, shard_batch

            dp = self.mesh.shape.get("dp", 1)
            if len(self.valid_pool) % dp == 0:
                g = shard_batch(self.mesh, g)
                self.params = replicate(self.mesh, self.params)
        state = batched_reset(g)
        ce_prune = self.cfg.variant == "ce" and self.cfg.action_pruning_test
        state = greedy_rollout(
            self.params, g, state, variant=self.cfg.variant,
            ce_prune=ce_prune, degree_cost=self.degree_cost,
        )
        covered_cnt = jnp.sum(state.covered & g.node_mask, axis=1)
        remain = g.n_nodes - covered_cnt
        max_rank = g.max_rank.astype(jnp.float32)
        n_f = g.n_nodes.astype(jnp.float32)
        score = state.score + remain.astype(jnp.float32) / (max_rank * n_f)
        if not return_extras:
            return float(jnp.mean(score))
        lmcc_final = state.rank.astype(jnp.float32) / max_rank
        audc = state.score * n_f / jnp.maximum(covered_cnt.astype(jnp.float32), 1.0)
        return float(jnp.mean(score)), np.asarray(lmcc_final), np.asarray(audc)

    def _ce_prior_diagnostics(self) -> str:
        """CE-PRIOR line (reference :671-677): mean boundary-node ratio and mean
        per-layer prior feature over the validation pool."""
        g = self.valid_pool.stacked
        nm = np.asarray(g.node_mask)
        n = np.maximum(nm.sum(1), 1)
        bratio = float(np.mean(np.asarray(g.boundary).sum(1) / n))
        feat = np.asarray(g.node_feat)  # [B, 2, N]
        f0 = float(np.mean(feat[:, 0].sum(1) / n))
        f1 = float(np.mean(feat[:, 1].sum(1) / n))
        return (
            f"CE-PRIOR feature={self.cfg.comm_prior_feature} "
            f"boundary_ratio_mean={bratio:.6f} feat_mean=[{f0:.6f},{f1:.6f}]"
        )

    # -- persistence -----------------------------------------------------------
    # Full-state checkpoints (params + target + optimizer + RNG), a true-resume
    # improvement over the reference's weights-only torch.save
    # (MultiDismantler_torch.py:787-797).  Default container is a pickle file;
    # a directory path selects the Orbax backend (async-safe, multi-host-aware,
    # the idiomatic JAX store for pod-scale runs).
    def _state_dict(self):
        return {
            "params": jax.device_get(self.params),
            "target_params": jax.device_get(self.target_params),
            "opt_state": jax.device_get(self.opt_state),
            "iteration": self.iteration,
            "nprng": self.nprng.bit_generator.state,
            "key": jax.device_get(self.key),
            "config": dataclasses.asdict(self.cfg),
        }

    def save(self, path: str):
        state = self._state_dict()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def save_orbax(self, path: str):
        import orbax.checkpoint as ocp

        state = self._state_dict()
        # array leaves go to orbax; host metadata (RNG state, config, iter)
        # to a sidecar json in the same directory
        meta = {k: state.pop(k) for k in ("nprng", "config", "iteration")}
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), state, force=True)
        with open(os.path.join(path, "agent_meta.json"), "w") as f:
            json.dump(meta, f)

    def load_orbax(self, path: str, weights_only: bool = False):
        import orbax.checkpoint as ocp

        # restore against the live state as target so optax NamedTuple
        # structure (and all dtypes) round-trip instead of nested dicts
        target = self._state_dict()
        for k in ("nprng", "config", "iteration"):
            target.pop(k)
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.abspath(path), target)
        with open(os.path.join(path, "agent_meta.json")) as f:
            state.update(json.load(f))
        self._restore(state, weights_only)

    def load(self, path: str, weights_only: bool = False):
        if os.path.isdir(path):
            return self.load_orbax(path, weights_only)
        with open(path, "rb") as f:
            state = pickle.load(f)
        self._restore(state, weights_only)

    def _restore(self, state, weights_only: bool = False):
        self.params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        self.target_params = jax.tree_util.tree_map(
            jnp.asarray, state["target_params"]
        )
        if not weights_only:
            self.opt_state = jax.tree_util.tree_map(jnp.asarray, state["opt_state"])
            self.iteration = state["iteration"]
            self.nprng.bit_generator.state = state["nprng"]
            self.key = jnp.asarray(state["key"])

    def load_torch(self, path: str):
        """Load a reference-format torch checkpoint."""
        from mdcommunity_tpu.models.torch_convert import load_torch_checkpoint

        self.params = load_torch_checkpoint(path)
        self.take_snapshot()

    # -- the training loop -------------------------------------------------------
    def train(self, save_dir: str = "./models_tpu", resume: bool = False,
              log=print) -> str:
        cfg = self.cfg
        os.makedirs(save_dir, exist_ok=True)
        vc_file = os.path.join(save_dir, f"ModelVC_{cfg.num_min}_{cfg.num_max}.csv")

        start_iter = 0
        if resume and os.path.isfile(os.path.join(save_dir, "latest.ckpt")):
            self.load(os.path.join(save_dir, "latest.ckpt"))
            start_iter = self.iteration
            log(f"resumed from iter {start_iter}")
            vc_out = open(vc_file, "a")
        else:
            vc_out = open(vc_file, "w")

        self.prepare_valid_data()
        self.gen_new_graphs()
        for _ in range(cfg.warmup_games):
            self.play_games(cfg.warmup_traj, 1.0)
        self.take_snapshot()

        best = float("inf")
        t_window = time.perf_counter()
        # per-window device-fenced timing + throughput counters
        # (reference observability: wall-clock prints :497,510-523)
        prof: dict = {}
        fit_meter = ThroughputMeter("fit-iters")
        try:
            for it in range(start_iter, cfg.max_iteration):
                self.iteration = it
                if it and it % cfg.save_frequency == 0:
                    self.gen_new_graphs()
                eps = cfg.eps_end + max(
                    0.0, (cfg.eps_start - cfg.eps_end) * (cfg.eps_step - it) / cfg.eps_step
                )
                if it % 10 == 0:
                    with device_timer("play", sink=prof):
                        self.play_games(10, eps)
                if it % cfg.save_frequency == 0:
                    t0 = time.time()
                    if cfg.variant == "ce":
                        frac, lmcc_final, audc = self.validate(return_extras=True)
                    else:
                        frac = self.validate()
                    if frac < best:
                        best = frac
                        self.save(os.path.join(save_dir, "best_model.ckpt"))
                    vc_out.write(f"{frac:.16f}\n")
                    vc_out.flush()
                    fit_meter.add(cfg.save_frequency if it else 0,
                                  prof.pop("fit", 0.0))
                    log(
                        f"iter {it}, eps {eps:.4f}, mean vc {frac:.6f} "
                        f"(valid {time.time()-t0:.1f}s, window "
                        f"{time.perf_counter()-t_window:.1f}s, "
                        f"play {prof.pop('play', 0.0):.1f}s, "
                        f"fit {fit_meter.rate:.1f} it/s)"
                    )
                    if cfg.variant == "ce":
                        # reference LMCC-DEBUG / CE-PRIOR lines (:636-677)
                        log(
                            "LMCC-DEBUG "
                            f"mean_final={float(np.mean(lmcc_final)):.6f} "
                            f"var_final={float(np.var(lmcc_final)):.6f} "
                            f"mean_audc={float(np.mean(audc)):.6f} "
                            f"var_audc={float(np.var(audc)):.6f}"
                        )
                        log(self._ce_prior_diagnostics())
                    t_window = time.perf_counter()
                    self.save(os.path.join(save_dir, "latest.ckpt"))
                    self.save(
                        os.path.join(
                            save_dir,
                            f"nrange_{cfg.num_min}_{cfg.num_max}_iter_{it}.ckpt",
                        )
                    )
                if it % cfg.update_time == 0:
                    self.take_snapshot()
                with device_timer("fit", sink=prof):
                    self.fit()
        finally:
            # flush the last fit's deferred priority update (otherwise the
            # final TD errors never reach the sum-tree)
            if self._pending_prio is not None:
                p_idx, p_td, p_gen = self._pending_prio
                self.replay.update_priorities(
                    p_idx, np.asarray(p_td), write_gen=p_gen
                )
                self._pending_prio = None
            self.iteration = cfg.max_iteration
            self.save(os.path.join(save_dir, "latest.ckpt"))
            vc_out.close()
        return save_dir


def find_model(save_dir: str, num_min: int = 30, num_max: int = 50,
               save_frequency: int = 1000, burn_in: int = 33) -> str:
    """Select the checkpoint at the argmin of the validation-cost curve after a
    burn-in (reference findModel :551-560; its 500-iter spacing is
    save_frequency here).  Falls back to burn_in=0 for short runs."""
    vc_file = os.path.join(save_dir, f"ModelVC_{num_min}_{num_max}.csv")
    vc = [float(line) for line in open(vc_file)]
    if len(vc) <= burn_in:
        burn_in = 0
    best_row = burn_in + int(np.argmin(np.asarray(vc[burn_in:])))
    it = best_row * save_frequency
    return os.path.join(save_dir, f"nrange_{num_min}_{num_max}_iter_{it}.ckpt")
