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
    losses = {}
    for out, p in zip(outs, procs):
        if p.returncode != 0:
            raise RuntimeError(f"child failed rc={p.returncode}:\n{out}")
        m = re.search(r"MHLOSS process=(\d+) loss=([-\d.e]+)", out)
        if not m:
            raise RuntimeError(f"no MHLOSS line in child output:\n{out}")
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == set(range(N_PROC)), losses
    vals = list(losses.values())
    assert all(abs(v - vals[0]) < 1e-9 for v in vals), losses
    print(f"multihost_smoke OK: {N_PROC} processes, loss={vals[0]:.10f}")
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
