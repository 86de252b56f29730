import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from video_depth_anything_tpu.utils.compile_cache import enable_persistent_cache
print("cache dir:", enable_persistent_cache())
try:
    jax.config.update("jax_explain_cache_misses", True)
except Exception as e:
    print("no explain flag:", e)
t0=time.time()
f = jax.jit(lambda x: jnp.sin(x) @ x.T * 3.14159)
y = f.lower(jnp.zeros((777, 333))).compile()
print("compile took", round(time.time()-t0,2), "s")
