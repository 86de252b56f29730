import sys, time
sys.path.insert(0, "/root/repo")
from video_depth_anything_tpu.utils.compile_cache import enable_persistent_cache
d = enable_persistent_cache()
print("cache dir:", d, flush=True)
import jax, jax.numpy as jnp
print("backend:", jax.devices(), flush=True)

@jax.jit
def f(x, w):
    # unique-ish structure so we don't collide with prior programs
    y = jnp.tanh(x @ w)
    return (y * 1.0009765625 @ w.T).sum(axis=1)

x = jnp.ones((256, 512), jnp.bfloat16)
w = jnp.ones((512, 512), jnp.bfloat16)
t0 = time.time()
f(x, w).block_until_ready()
print("compile+run s:", round(time.time() - t0, 2), flush=True)
