import sys, os
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as ge
fn, args = ge.entry.__wrapped__() if hasattr(ge.entry, "__wrapped__") else ge.entry()
out = fn(*args)
print("entry OK:", out.shape, flush=True)
ge.dryrun_multichip(8)
