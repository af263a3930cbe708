"""Multi-process (multi-host analogue) smoke: 2 OS processes, gloo CPU
collectives, one dp-sharded train step through
parallel.mesh.init_distributed — see scripts/multihost_smoke.py.

Runs in a subprocess because jax.distributed.initialize must precede any
backend use, and the pytest process already initialized jax."""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_train_step():
    env = dict(os.environ, MDC_MH_PORT="29741")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=560, cwd=REPO, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    m = re.search(r"multihost_smoke OK: 2 processes, loss=([-\d.e]+)", out.stdout)
    assert m, out.stdout
    assert re.search(r"matches single-process loss", out.stdout), out.stdout
    # round 5: the gp (halo-exchange) axis spanning both OS processes —
    # every ppermute/all_gather of parallel/band_partition.py crosses the
    # process boundary (the real pod's DCN/ICI path)
    assert re.search(
        r"gp=4 spanning both processes: band halo-exchange fwd\+VJP \+ "
        r"banded_train_loss grad verified cross-process", out.stdout,
    ), out.stdout
