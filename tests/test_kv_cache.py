"""KV-cache temporal attention step vs the full-window attention."""

import jax
import jax.numpy as jnp
import numpy as np

from video_depth_anything_tpu.config import MotionModuleConfig
from video_depth_anything_tpu.models.temporal import TemporalSelfAttention


def test_kv_step_matches_full_attention_last_frame(rng):
    """With the cache holding frames 0..T−2 (keys/values computed with their
    own APE slots), a kv_step for frame T−1 must equal the last-frame output
    of full self-attention over all T frames."""
    cfg = MotionModuleConfig(num_heads=4, temporal_max_len=8)
    dim = 32
    b, t, s = 1, 8, 5
    attn = TemporalSelfAttention(cfg, dim, attn_impl="xla")
    x = jnp.asarray(rng.randn(b, t, s, dim), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)

    full = attn.apply(params, x)

    # build the cache the way a streaming run would: project each cached
    # frame with its own APE position
    from video_depth_anything_tpu.models.temporal import sinusoidal_position_table

    pe = sinusoidal_position_table(cfg.temporal_max_len, dim)
    p = params["params"]
    x_pos = x[:, : t - 1] + pe[: t - 1, None, :]
    k_cache = x_pos @ p["to_k"]["kernel"]
    v_cache = x_pos @ p["to_v"]["kernel"]

    out, k2, v2 = attn.apply(
        params, x[:, t - 1 :], k_cache, v_cache, method="kv_step"
    )
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(full[:, -1]), rtol=1e-5, atol=1e-5
    )
    # eviction: cache length preserved, newest entry present
    assert k2.shape == k_cache.shape
    x_new_pos = x[:, t - 1 :] + pe[t - 1]
    np.testing.assert_allclose(
        np.asarray(k2[:, -1]),
        np.asarray((x_new_pos @ p["to_k"]["kernel"])[:, 0]),
        rtol=1e-5,
    )
    # the fixed bug: v cache must hold VALUES, not keys (ref
    # motion_module.py:281 concatenates key into computed_v)
    np.testing.assert_allclose(
        np.asarray(v2[:, -1]),
        np.asarray((x_new_pos @ p["to_v"]["kernel"])[:, 0]),
        rtol=1e-5,
    )
