"""Multi-host (multi-process) smoke: one dp-sharded DQN train step across
2 OS processes via jax.distributed — exercises parallel.mesh.init_distributed
and the cross-process collective path (gradient psum over 'dp').

The reference has no distributed machinery at all (SURVEY.md §2.7); on real
TPU pods the same code path brings up the slice (init_distributed() with no
args, mesh over all chips).  Here each process owns 2 virtual CPU devices and
collectives run over gloo, validating the multi-process plumbing end-to-end:
both processes must compute the identical, finite loss, which the parent also
checks against a single-process run of the same step.

Usage:
  python scripts/multihost_smoke.py                 # parent: spawns 2 children
  python scripts/multihost_smoke.py --process-id K  # child (internal)
"""

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("MDC_MH_PORT", "29731"))
N_PROC = 2
LOCAL_DEVICES = 2
BATCH = 8  # = 2 * global dp


def _setup_child(process_id: int):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from mdcommunity_tpu.parallel.mesh import init_distributed

    idx = init_distributed(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert idx == process_id and jax.process_count() == N_PROC
    return jax


def _global_inputs(mesh):
    """Deterministic tiny batch; every process builds the same host data and
    assembles global arrays from its local shards."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge

    params, gb, state = ge._tiny_setup(batch=BATCH)
    from mdcommunity_tpu.env.batch import make_batch_inputs

    inputs = make_batch_inputs(gb, state.covered, state.sever, dense=True)
    actions = np.argmax(np.asarray(inputs.deg[:, 0]), axis=1).astype(np.int32)

    def g_dp(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    def g_rep(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, P())
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    tm = jax.tree_util.tree_map
    return dict(
        params=tm(g_rep, params),
        gb=tm(g_dp, gb),
        covered=g_dp(state.covered),
        sever=g_dp(state.sever),
        actions=g_dp(actions),
        rewards=g_dp(np.zeros(BATCH, np.float32)),
        terminal=g_dp(np.zeros(BATCH, bool)),
    )


def _band_setup():
    """Deterministic zero-spill banded duplex (identical in every process):
    ring-local offsets < B/2 so the identity order is band-perfect."""
    import numpy as np

    from mdcommunity_tpu.graphs.banded import build_banded_duplex

    rng = np.random.default_rng(11)
    n = 4096
    te = []
    for _ in range(2):
        us = rng.integers(0, n, n * 3).astype(np.int64)
        ud = (us + rng.integers(1, 64, n * 3)) % n
        keep = us != ud
        te.append(np.stack([us[keep], ud[keep]], 1))
    banded, _p, _oe = build_banded_duplex(n, te[0], te[1])
    for l in range(2):
        assert banded.dbg(l).spill.d_src.shape[0] == 0
    return n, banded


def _mk_global(mesh, x, spec):
    """Assemble a process-spanning global array from identical host data."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    x = np.asarray(x)
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def _global_banded(mesh, banded):
    """BandedDuplex placed like graphs.banded.shard_banded_duplex, but via
    make_array_from_callback so the 'gp' axis spans OS processes."""
    import dataclasses

    import jax
    from jax.sharding import PartitionSpec as P

    def g_dbg(dbg):
        rep = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: _mk_global(mesh, x, P()), t
        )
        return dataclasses.replace(
            dbg,
            base=_mk_global(mesh, dbg.base, P("gp")),
            ccoo=rep(dbg.ccoo),
            w_cov=_mk_global(mesh, dbg.w_cov, P()),
            c_usrc=_mk_global(mesh, dbg.c_usrc, P()),
            c_udst=_mk_global(mesh, dbg.c_udst, P()),
            spill=rep(dbg.spill),
            w_spill=_mk_global(mesh, dbg.w_spill, P()),
        )

    return dataclasses.replace(
        banded,
        dbg0=g_dbg(banded.dbg0),
        dbg1=g_dbg(banded.dbg1),
        node_mask=_mk_global(mesh, banded.node_mask, P("gp")),
        weights=_mk_global(mesh, banded.weights, P(None, "gp")),
        node_feat=_mk_global(mesh, banded.node_feat, P(None, "gp")),
        n_nodes=_mk_global(mesh, banded.n_nodes, P()),
        n_edges=_mk_global(mesh, banded.n_edges, P()),
        max_rank=_mk_global(mesh, banded.max_rank, P()),
    )


def run_child_gp(jax, process_id: int) -> None:
    """Phase 2 (round 5): the gp (edge-partition/halo) axis SPANNING the two
    OS processes — every ppermute halo exchange and mirror all_gather of
    parallel/band_partition.py crosses the process boundary (the DCN/ICI
    path on a real pod).  Verifies spmm_band_sharded fwd+VJP and one
    banded_train_loss value+grad against single-device references computed
    locally; each process checks its OWN addressable shards."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from mdcommunity_tpu.models.net import banded_train_loss
    from mdcommunity_tpu.ops.dense_band import spmm_dense_band
    from mdcommunity_tpu.parallel.band_partition import spmm_band_sharded
    from mdcommunity_tpu.parallel.mesh import make_mesh
    from mdcommunity_tpu.rl.dqn import DQNAgent
    from mdcommunity_tpu.utils.config import Config

    n, banded = _band_setup()
    pad_n = banded.pad_n
    rngl = np.random.default_rng(3)
    h = rngl.standard_normal((pad_n, 64)).astype(np.float32)
    row = (rngl.random(pad_n) < 0.9).astype(np.float32)
    col = (rngl.random(pad_n) < 0.9).astype(np.float32)
    g0 = rngl.standard_normal((pad_n, 64)).astype(np.float32)
    params = DQNAgent(Config(variant="unit_cost"), seed=0).params
    covered = rngl.random(pad_n) < 0.05
    covered[n:] = True
    acts = np.flatnonzero(~covered[:n])[:8].astype(np.int32)
    tgts = rngl.standard_normal(8).astype(np.float32)

    # single-device references (before entering the multi-process mesh)
    out_ref = np.asarray(spmm_dense_band(
        banded.dbg(0), jnp.asarray(row), jnp.asarray(col), jnp.asarray(h),
        True,
    ))
    dh_ref = np.asarray(jax.grad(
        lambda hh: (spmm_dense_band(
            banded.dbg(0), jnp.asarray(row), jnp.asarray(col), hh, True
        ) * g0).sum()
    )(jnp.asarray(h)))
    loss_ref = float(banded_train_loss(
        params, banded, jnp.asarray(covered), jnp.asarray(acts),
        jnp.asarray(tgts), precise=True,
    ))

    mesh = make_mesh(dp=1, gp=N_PROC * LOCAL_DEVICES)
    with mesh:
        bdx_g = _global_banded(mesh, banded)
        h_g = _mk_global(mesh, h, P("gp"))
        row_g = _mk_global(mesh, row, P("gp"))
        col_g = _mk_global(mesh, col, P("gp"))
        g0_g = _mk_global(mesh, g0, P("gp"))
        cov_g = _mk_global(mesh, covered, P("gp"))
        params_g = jax.tree_util.tree_map(
            lambda x: _mk_global(mesh, x, P()), params
        )

        # NOTE: process-spanning global arrays may not be closed over inside
        # jit in multi-process mode — everything rides as arguments
        out_g = spmm_band_sharded(mesh, bdx_g.dbg(0), row_g, col_g, h_g,
                                  precise=True)

        def _vjp_loss(hh, dbg, r, c, g):
            return (spmm_band_sharded(mesh, dbg, r, c, hh, True) * g).sum()

        dh_g = jax.jit(jax.grad(_vjp_loss))(
            h_g, bdx_g.dbg(0), row_g, col_g, g0_g
        )

        def _tl(p, b, cov):
            return banded_train_loss(
                p, b, cov, jnp.asarray(acts), jnp.asarray(tgts),
                precise=True, mesh=mesh,
            )

        loss_g, grads_g = jax.jit(jax.value_and_grad(_tl))(
            params_g, bdx_g, cov_g
        )
        jax.block_until_ready((out_g, dh_g, loss_g))

        for s in out_g.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(s.data), out_ref[s.index], rtol=2e-4, atol=2e-4
            )
        for s in dh_g.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(s.data), dh_ref[s.index], rtol=2e-4, atol=2e-4
            )
        assert abs(float(loss_g) - loss_ref) < 1e-4 * max(abs(loss_ref), 1.0)
        gnorm = float(sum(
            float(jnp.sum(jnp.asarray(x) ** 2)) ** 0.5
            for x in jax.tree_util.tree_leaves(grads_g)
        ))
    print(
        f"MHGP process={process_id} loss={float(loss_g):.10f} "
        f"ref={loss_ref:.10f} gnorm={gnorm:.6f}",
        flush=True,
    )


def run_child(process_id: int) -> None:
    jax = _setup_child(process_id)
    import optax

    from mdcommunity_tpu.parallel.mesh import make_mesh
    from mdcommunity_tpu.rl.dqn import train_step

    n_dev = N_PROC * LOCAL_DEVICES
    mesh = make_mesh(dp=n_dev, gp=1)
    optimizer = optax.adam(1e-4)
    with mesh:
        b = _global_inputs(mesh)
        opt_state = jax.tree_util.tree_map(
            lambda x: x, optimizer.init(b["params"])
        )
        new_params, _, loss, *_ = train_step(
            b["params"], b["params"], opt_state, b["gb"],
            b["covered"], b["sever"], b["actions"], b["rewards"],
            b["covered"], b["sever"], b["terminal"],
            optimizer=optimizer,
        )
        jax.block_until_ready(new_params)
    print(f"MHLOSS process={process_id} loss={float(loss):.10f}", flush=True)
    run_child_gp(jax, process_id)


def _single_process_loss() -> float:
    """The same step on one process (all local devices) for comparison."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_PROC * LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from mdcommunity_tpu.parallel.mesh import make_mesh
    from mdcommunity_tpu.rl.dqn import train_step

    mesh = make_mesh(dp=N_PROC * LOCAL_DEVICES, gp=1)
    optimizer = optax.adam(1e-4)
    with mesh:
        b = _global_inputs(mesh)
        opt_state = optimizer.init(b["params"])
        _, _, loss, *_ = train_step(
            b["params"], b["params"], opt_state, b["gb"],
            b["covered"], b["sever"], b["actions"], b["rewards"],
            b["covered"], b["sever"], b["terminal"],
            optimizer=optimizer,
        )
    return float(loss)


def run_parent() -> float:
    """Spawn the children, collect their losses, verify agreement.  Returns
    the agreed loss."""
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--process-id", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(N_PROC)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses, gp_losses = {}, {}
    for out, p in zip(outs, procs):
        if p.returncode != 0:
            raise RuntimeError(f"child failed rc={p.returncode}:\n{out}")
        m = re.search(r"MHLOSS process=(\d+) loss=([-\d.e]+)", out)
        if not m:
            raise RuntimeError(f"no MHLOSS line in child output:\n{out}")
        losses[int(m.group(1))] = float(m.group(2))
        m2 = re.search(r"MHGP process=(\d+) loss=([-\d.e]+) ref=([-\d.e]+)",
                       out)
        if not m2:
            raise RuntimeError(f"no MHGP line in child output:\n{out}")
        gp_losses[int(m2.group(1))] = float(m2.group(2))
    assert set(losses) == set(range(N_PROC)), losses
    vals = list(losses.values())
    assert all(abs(v - vals[0]) < 1e-9 for v in vals), losses
    gvals = list(gp_losses.values())
    assert all(abs(v - gvals[0]) < 1e-9 for v in gvals), gp_losses
    print(f"multihost_smoke OK: {N_PROC} processes, loss={vals[0]:.10f}; "
          f"gp={N_PROC * LOCAL_DEVICES} spanning both processes: band "
          f"halo-exchange fwd+VJP + banded_train_loss grad verified "
          f"cross-process (loss={gvals[0]:.10f})")
    return vals[0]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()
    if args.process_id is None:
        loss = run_parent()
        ref = _single_process_loss()
        assert abs(loss - ref) < 1e-5, (loss, ref)
        print(f"matches single-process loss {ref:.10f}")
    else:
        run_child(args.process_id)
