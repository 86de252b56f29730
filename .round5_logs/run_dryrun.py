import sys
sys.path.insert(0, "/root/repo")
import os
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn).lower(*args).compile()(*args)
print("entry OK", out.shape)
g.dryrun_multichip(8)
