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
from mdcommunity_tpu.graphs.duplex import DuplexGraph, GraphPool, index_graphs
from mdcommunity_tpu.graphs.gmm import generate_pool
from mdcommunity_tpu.models.net import (
    init_params,
    laplacian_regularizer,
    param_count,
    test_forward,
    train_forward,
)
from mdcommunity_tpu.utils.config import Config


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


@partial(
    jax.jit,
    static_argnames=("n_steps", "variant", "degree_cost", "ce_prune",
                     "hca_bridge", "hca_beta", "hca_tau"),
)
def rollout_chunk(
    params,
    g: DuplexGraph,
    state: EnvState,
    key,
    eps,
    n_steps: int = 8,
    variant: str = "unit_cost",
    degree_cost: bool = False,
    ce_prune: bool = False,
    hca_bridge: bool = False,
    hca_beta: float = 0.5,
    hca_tau: float = 0.5,
):
    """n_steps eps-greedy env steps as ONE device program (lax.scan): the whole
    history comes back in a single host transfer instead of one round trip per
    step (through the TPU relay each trip is ~30 ms).  Terminal envs freeze
    (env_step is a masked no-op), so chunks can overrun episode ends; the host
    slices episodes out of the history (play_games).

    Returns (final_state, history dict of [n_steps, B] arrays).
    """
    from mdcommunity_tpu.env.env import batched_random_actions

    def step(carry, key_s):
        state = carry
        kq, ka = jax.random.split(key_s)
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
        was_terminal = state.terminal
        new_state, rewards = batched_step(g, state, actions, degree_cost)
        rewards = rewards + (hca_beta * bonus if hca_bridge else 0.0)
        out = dict(
            actions=actions,
            rewards=rewards,
            covered=new_state.covered,
            sever=new_state.sever,
            valid=~was_terminal,
            terminal=new_state.terminal,
        )
        return new_state, out

    keys = jax.random.split(key, n_steps)
    final_state, hist = jax.lax.scan(step, state, keys)
    return final_state, hist


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
            # keep f32 params/activations but run MXU passes at bf16 rate
            # (embedding widths are 64: quantization noise ~2^-8 per matmul,
            # well inside the DQN's tolerance; full f32 stays the default)
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
        self.train_pool = GraphPool()
        self.valid_pool = GraphPool()
        self.iteration = 0
        self._env_state: Optional[EnvState] = None
        self._env_gids: Optional[np.ndarray] = None
        self._env_graphs: Optional[DuplexGraph] = None
        self._traj: List[dict] = []

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
        """Refresh the training pool (reference gen_new_graphs :151-160)."""
        self.train_pool.clear()
        for g in generate_pool(
            self.nprng, self.cfg.n_train, self.cfg.num_min, self.cfg.num_max,
            self.cfg.pad_nodes, self.cfg.pad_edges, self.degree_cost,
            self._prior_feature,
        ):
            self.train_pool.insert(g)
        # envs hold ids into the old pool; force re-reset
        self._env_state = None

    def prepare_valid_data(self):
        self.valid_pool.clear()
        for g in generate_pool(
            self.nprng, self.cfg.n_valid, self.cfg.num_min, self.cfg.num_max,
            self.cfg.pad_nodes, self.cfg.pad_edges, self.degree_cost,
            self._prior_feature,
        ):
            self.valid_pool.insert(g)

    # -- rollouts -------------------------------------------------------------
    def _reset_envs(self, ids_to_reset: Optional[np.ndarray] = None):
        ne = self.cfg.num_env
        if self._env_state is None or ids_to_reset is None:
            self._env_gids = self.train_pool.sample_ids(self.nprng, ne)
            self._env_graphs = index_graphs(
                self.train_pool.stacked, jnp.asarray(self._env_gids)
            )
            self._env_state = batched_reset(self._env_graphs)
            self._traj = [self._new_traj(i) for i in range(ne)]
        else:
            self._env_gids[ids_to_reset] = self.train_pool.sample_ids(
                self.nprng, len(ids_to_reset)
            )
            self._env_graphs = index_graphs(
                self.train_pool.stacked, jnp.asarray(self._env_gids)
            )
            state = self._env_state
            fresh = batched_reset(self._env_graphs)
            mask = np.zeros(ne, bool)
            mask[ids_to_reset] = True
            m = jnp.asarray(mask)

            def mix(a, b):
                shape = (-1,) + (1,) * (a.ndim - 1)
                return jnp.where(m.reshape(shape), b, a)

            self._env_state = jax.tree_util.tree_map(mix, state, fresh)
            for i in ids_to_reset:
                self._traj[i] = self._new_traj(i)

    def _new_traj(self, i):
        st = self._env_state
        return {
            "gid": int(self._env_gids[i]),
            "covered": [np.asarray(st.covered[i])],
            "sever": [np.asarray(st.sever[i])],
            "actions": [],
            "rewards": [],
        }

    def play_games(self, n_traj: int, eps: float):
        """Collect n_traj finished episodes into replay (reference Run_simulator)."""
        if len(self.train_pool) == 0:
            self.gen_new_graphs()
        if self._env_state is None:
            self._reset_envs()
        ce_prune = self.cfg.variant == "ce" and self.cfg.action_pruning_train
        hca_bridge = self.cfg.variant == "hca" and self.cfg.hca_bridge_effective
        done = 0
        guard = 0
        term = np.asarray(self._env_state.terminal)
        while done < n_traj and guard < 100000:
            guard += 1
            finished = np.nonzero(term)[0]
            if len(finished):
                for i in finished:
                    t = self._traj[i]
                    if t["actions"]:
                        self.replay.add_episode(
                            t["gid"], t["covered"], t["sever"], t["actions"], t["rewards"]
                        )
                        done += 1
                self._reset_envs(finished)
                if done >= n_traj:
                    break
                # immediately-terminal fresh graphs are handled next loop
                term = np.asarray(self._env_state.terminal)
                continue

            # K env steps as one device program + ONE host transfer
            self.key, k = jax.random.split(self.key)
            new_state, hist = rollout_chunk(
                self.params, self._env_graphs, self._env_state, k,
                jnp.float32(eps),
                n_steps=self.cfg.rollout_chunk,
                variant=self.cfg.variant,
                degree_cost=self.degree_cost,
                ce_prune=ce_prune,
                hca_bridge=hca_bridge,
                hca_beta=self.cfg.hca_beta,
                hca_tau=self.cfg.hca_tau,
            )
            hist, term = jax.device_get((hist, new_state.terminal))
            for s in range(hist["actions"].shape[0]):
                for i in np.nonzero(hist["valid"][s])[0]:
                    t = self._traj[i]
                    t["actions"].append(int(hist["actions"][s, i]))
                    t["rewards"].append(float(hist["rewards"][s, i]))
                    t["covered"].append(hist["covered"][s, i])
                    t["sever"].append(hist["sever"][s, i])
            self._env_state = new_state

    # -- fitting ---------------------------------------------------------------
    def take_snapshot(self):
        self.target_params = jax.tree_util.tree_map(jnp.copy, self.params)

    def fit(self) -> float:
        if self.cfg.use_prioritized:
            pb = self.replay.sample_prioritized(self.nprng, self.cfg.batch_size)
            batch, tree_idx, iw = pb.batch, pb.tree_idx, jnp.asarray(pb.is_weights)
        else:
            batch = self.replay.sample(self.nprng, self.cfg.batch_size)
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
            self.replay.update_priorities(tree_idx, np.asarray(td))
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
        try:
            for it in range(start_iter, cfg.max_iteration):
                self.iteration = it
                if it and it % cfg.save_frequency == 0:
                    self.gen_new_graphs()
                eps = cfg.eps_end + max(
                    0.0, (cfg.eps_start - cfg.eps_end) * (cfg.eps_step - it) / cfg.eps_step
                )
                if it % 10 == 0:
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
                    log(
                        f"iter {it}, eps {eps:.4f}, mean vc {frac:.6f} "
                        f"(valid {time.time()-t0:.1f}s, window "
                        f"{time.perf_counter()-t_window:.1f}s)"
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
                self.fit()
        finally:
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
