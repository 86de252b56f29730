import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from video_depth_anything_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
from video_depth_anything_tpu.models.vda import VDAModel
model = VDAModel("vits", dtype=jnp.bfloat16)
model.init_params(jax.random.PRNGKey(0))
x = jnp.asarray(np.zeros((1, 2, 28, 28, 3)), dtype=jnp.bfloat16)
t0 = time.time()
c = model._jit_forward.lower(model.params, x).compile()
print("compile took", round(time.time()-t0, 2), "s")
