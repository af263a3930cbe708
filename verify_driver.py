"""Driver-entry verification on the 8-virtual-device CPU mesh."""
import os

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as ge  # noqa: E402

fn, args = ge.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry() compile+run OK:", jax.tree_util.tree_map(lambda x: x.shape, out))
ge.dryrun_multichip(8)
