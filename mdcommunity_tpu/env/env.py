"""The duplex-dismantling MDP, batched and jit-compiled.

Reference: MvcEnv (mvc_env.py:8-162).  State there is (covered set, per-layer
severed-edge sets, incremental networkx graphs); here it is a pytree of masks with
static shapes, so `env_step` vmaps over a batch of environments and runs entirely
on device.  Key semantic notes:

* Reset runs the cascade on the intact graph — the two layers' partitions usually
  disagree already, so edges are severed at t=0 exactly as the reference's s0 →
  getMaxConnectedNodesNum → Mcc.MCC call chain does (mvc_env.py:31-52,140-162).
* Terminal ⇔ some layer has no live edge, where live = not severed ∧ both
  endpoints uncovered.  This is equivalent to the reference's covered-edge
  accounting (mvc_env.py:128-131): every original edge is exactly one of
  {covered-counted, severed, live}.
* reward = -(rank / max_rank) * cost(a) with cost(a) = 1/N for the unit variant
  (mvc_env.py:133-138) and (w0[a]/Σw0 + w1[a]/Σw1)/2 for the degree-cost variant
  (MultiDismantler_degree_cost/mvc_env.py:127-133).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mdcommunity_tpu.env.cascade import cascade, cascade_from_scratch
from mdcommunity_tpu.graphs.duplex import DuplexGraph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Unbatched environment state (vmap for a batch).

    covered  : bool[N]   removed nodes
    sever    : bool[2,E] cascade-severed directed edges (persistent)
    rank     : int32[]   current LMCC size
    score    : f32[]     accumulated AUDC contribution  Σ rank_t/(max_rank·N)
    t        : int32[]   steps taken
    terminal : bool[]
    """

    covered: jnp.ndarray
    sever: jnp.ndarray
    rank: jnp.ndarray
    score: jnp.ndarray
    t: jnp.ndarray
    terminal: jnp.ndarray


def _live_layer_any(g: DuplexGraph, covered, sever) -> jnp.ndarray:
    """bool[2]: does layer l still have a live edge?"""
    ep = ~covered[g.src] & ~covered[g.dst]
    live = g.edge_mask & ~sever & ep
    return jnp.any(live, axis=1)


def env_reset(g: DuplexGraph) -> EnvState:
    """Fresh state on graph g, including the t=0 cascade."""
    covered = jnp.zeros(g.pad_n, bool)
    res = cascade_from_scratch(g, covered)
    has_live = _live_layer_any(g, covered, res.sever)
    return EnvState(
        covered=covered,
        sever=res.sever,
        rank=res.rank,
        score=jnp.float32(0.0),
        t=jnp.int32(0),
        terminal=~jnp.all(has_live),
    )


def removal_cost(g: DuplexGraph, a: jnp.ndarray, degree_cost: bool) -> jnp.ndarray:
    """Per-action cost factor in the reward (see module docstring)."""
    if degree_cost:
        wsum = jnp.sum(g.weights * g.node_mask[None, :], axis=1)
        return 0.5 * (g.weights[0, a] / wsum[0] + g.weights[1, a] / wsum[1])
    return 1.0 / g.n_nodes.astype(jnp.float32)


def env_step(
    g: DuplexGraph, state: EnvState, a: jnp.ndarray, degree_cost: bool = False
) -> Tuple[EnvState, jnp.ndarray]:
    """Remove node `a`, run the cascade, return (new_state, reward).

    Stepping a terminal env is a masked no-op (returns reward 0) so a batch can
    keep running under jit after some members finish.
    """
    covered = state.covered.at[a].set(True)
    res = cascade(g, covered, state.sever)
    rank_f = res.rank.astype(jnp.float32)
    norm = rank_f / g.max_rank.astype(jnp.float32)
    reward = -norm * removal_cost(g, a, degree_cost)
    has_live = _live_layer_any(g, covered, res.sever)
    # score accumulates -reward: rank/(max_rank·N) for unit cost, the
    # cost-weighted norm for degree cost (degree_cost/mvc_env.py:79-80)
    new = EnvState(
        covered=covered,
        sever=res.sever,
        rank=res.rank,
        score=state.score - reward,
        t=state.t + 1,
        terminal=~jnp.all(has_live),
    )
    # masked no-op for already-terminal envs
    keep = state.terminal
    new = jax.tree_util.tree_map(
        lambda old_x, new_x: jnp.where(keep, old_x, new_x), state, new
    )
    return new, jnp.where(keep, 0.0, reward)


def is_terminal(state: EnvState) -> jnp.ndarray:
    return state.terminal


def valid_action_mask(g: DuplexGraph, state: EnvState) -> jnp.ndarray:
    """bool[N]: uncovered nodes with a live edge in both layers.

    Reference randomAction requires a live edge in *both* layers
    (mvc_env.py:89-101); after the cascade the two survivor sets coincide
    (PrepareBatchGraph.py:73 asserts this), so either-layer membership is
    equivalent — we still check both for defense in depth.
    """
    ep = ~state.covered[g.src] & ~state.covered[g.dst]
    live = g.edge_mask & ~state.sever & ep
    w = live.astype(jnp.int32)
    deg = jax.vmap(lambda s, m: jnp.zeros(g.pad_n, jnp.int32).at[s].add(m))(g.src, w)
    return (~state.covered) & g.node_mask & (deg[0] > 0) & (deg[1] > 0)


def random_action(
    g: DuplexGraph, state: EnvState, key: jax.Array, boundary_first: bool = False
) -> jnp.ndarray:
    """Uniform over valid actions (reference: mvc_env.randomAction :89-101).

    boundary_first=True restricts to CE boundary candidates while any remain
    (reference: CEMultiDismantler/mvc_env.getValidActions :85-100)."""
    mask = valid_action_mask(g, state)
    if boundary_first:
        cand = mask & g.boundary
        mask = jnp.where(jnp.any(cand), cand, mask)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits)


def hca_bridge_bonus(g: DuplexGraph, state: EnvState, a: jnp.ndarray,
                     tau: float = 0.5) -> jnp.ndarray:
    """HCA bridge-reward shaping term, computed from the PRE-step state:
    broken inter-community live edges at `a` / live degree of `a`, gated on
    f_het(a) > tau (reference: HCA-Dismantler/mvc_env.getReward :258-300).

    Note: the reference inspects neighbors AFTER getMaxConnectedNodesNum has
    already removed `a` from its incremental graphs, so its bonus always
    evaluates to 0; we implement the evident intent (pre-removal neighborhood)
    behind Config.hca_bridge_effective."""
    ep = ~state.covered[g.src] & ~state.covered[g.dst]
    live = g.edge_mask & ~state.sever & ep              # [2, E]
    at_a = live & (g.src == a)                          # directed edges out of a
    deg_cost = jnp.sum(at_a)
    inter = at_a & (
        jnp.take_along_axis(g.comm_id, g.src, axis=1)
        != jnp.take_along_axis(g.comm_id, g.dst, axis=1)
    )
    broken = jnp.sum(inter)
    bonus = broken.astype(jnp.float32) / (deg_cost.astype(jnp.float32) + 1e-6)
    return jnp.where(g.hca_feat[a, 0] > tau, bonus, 0.0)


def prune_q_to_boundary(q: jnp.ndarray, boundary: jnp.ndarray) -> jnp.ndarray:
    """CE divide-and-conquer action pruning: while valid boundary candidates
    remain, mask everything else to -inf (reference:
    CEMultiDismantler/MultiDismantler_torch._apply_action_pruning :159-175).

    q: [B, N] with invalid actions already -inf; boundary: bool[B, N]."""
    cand = boundary & jnp.isfinite(q)
    has = jnp.any(cand, axis=1, keepdims=True)
    return jnp.where(has & ~cand, -jnp.inf, q)


# ---- jitted singles and batched wrappers ------------------------------------

env_reset_jit = jax.jit(env_reset)
env_step_jit = jax.jit(env_step, static_argnames=("degree_cost",))
valid_action_mask_jit = jax.jit(valid_action_mask)

batched_reset = jax.jit(jax.vmap(env_reset))


@partial(jax.jit, static_argnames=("degree_cost",))
def batched_step(g: DuplexGraph, state: EnvState, actions, degree_cost: bool = False):
    return jax.vmap(lambda gg, ss, aa: env_step(gg, ss, aa, degree_cost))(
        g, state, actions
    )


@partial(jax.jit, static_argnames=("boundary_first",))
def batched_random_actions(
    g: DuplexGraph, state: EnvState, key: jax.Array, boundary_first: bool = False
):
    keys = jax.random.split(key, state.covered.shape[0])
    return jax.vmap(lambda gg, ss, kk: random_action(gg, ss, kk, boundary_first))(
        g, state, keys
    )


@jax.jit
def batched_valid_mask(g: DuplexGraph, state: EnvState):
    return jax.vmap(valid_action_mask)(g, state)
