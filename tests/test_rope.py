"""RoPE temporal-position variant vs the reference rotary math
(``motion_module/attention.py:403-429``)."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

from tests.reference_oracle import REFERENCE_ROOT, _install_shims
from video_depth_anything_tpu.config import MotionModuleConfig
from video_depth_anything_tpu.models.temporal import _apply_rope, rope_tables


def test_apply_rope_matches_reference(rng):
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from video_depth_anything.motion_module.attention import (
        apply_rotary_emb,
        precompute_freqs_cis,
    )

    dim, t = 32, 8
    xq = rng.randn(3, t, dim).astype(np.float32)
    xk = rng.randn(3, t, dim).astype(np.float32)

    freqs = precompute_freqs_cis(dim, t)
    want_q, want_k = apply_rotary_emb(
        torch.from_numpy(xq), torch.from_numpy(xk), freqs
    )

    cos, sin = rope_tables(t, dim)
    got_q = np.asarray(_apply_rope(jnp.asarray(xq), jnp.asarray(cos), jnp.asarray(sin)))
    got_k = np.asarray(_apply_rope(jnp.asarray(xk), jnp.asarray(cos), jnp.asarray(sin)))
    np.testing.assert_allclose(got_q, want_q.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_k, want_k.numpy(), rtol=1e-5, atol=1e-5)


def test_rope_temporal_module_runs(rng):
    import jax

    from video_depth_anything_tpu.models.temporal import TemporalModule

    cfg = MotionModuleConfig(num_heads=4, temporal_max_len=8, pos_embedding_type="rope")
    tm = TemporalModule(cfg, 32, "xla")
    x = jnp.asarray(rng.randn(1, 8, 5, 6, 32), jnp.float32)
    params = jax.jit(tm.init)(jax.random.PRNGKey(0), x)
    out = tm.apply(params, x)
    # zero-init proj_out -> identity at init, same as the APE variant
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
