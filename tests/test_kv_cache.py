"""KV-cache temporal attention: position-free ring caches vs full-window
attention.

The caches hold ``to_k(x)`` / ``to_v(x)`` WITHOUT positional encoding
(the projections are bias-free, so APE can be applied at attend time with
slots assigned oldest→newest over the *current* window) — unlike the
reference's experimental ``save_qkv`` (``motion_module.py:275-288``) whose
cached entries keep stale absolute positions, and which concatenates keys
into the value cache (the ``:281`` bug, fixed here).  Consequence pinned by
these tests: a kv_step over a cache seeded from frames 0..T−2 is EXACTLY
the last-frame output of full self-attention over all T frames.
"""

import jax
import jax.numpy as jnp
import numpy as np

from video_depth_anything_tpu.config import MotionModuleConfig
from video_depth_anything_tpu.models.temporal import (
    TemporalModule,
    TemporalSelfAttention,
    sinusoidal_position_table,
)


def test_kv_step_matches_full_attention_last_frame(rng):
    cfg = MotionModuleConfig(num_heads=4, temporal_max_len=8)
    dim = 32
    b, t, s = 1, 8, 5
    attn = TemporalSelfAttention(cfg, dim, attn_impl="xla")
    x = jnp.asarray(rng.randn(b, t, s, dim), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)

    full = attn.apply(params, x)

    # position-free cache of frames 0..T−2
    p = params["params"]
    k_cache = x[:, : t - 1] @ p["to_k"]["kernel"]
    v_cache = x[:, : t - 1] @ p["to_v"]["kernel"]

    out, k2, v2 = attn.apply(
        params, x[:, t - 1 :], k_cache, v_cache, method="kv_step"
    )
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(full[:, -1]), rtol=1e-5, atol=1e-5
    )
    # eviction: cache length preserved, newest (position-free) entry present
    assert k2.shape == k_cache.shape
    np.testing.assert_allclose(
        np.asarray(k2[:, -1]),
        np.asarray((x[:, t - 1 :] @ p["to_k"]["kernel"])[:, 0]),
        rtol=1e-5,
    )
    # the fixed bug: v cache must hold VALUES, not keys (ref
    # motion_module.py:281 concatenates key into computed_v)
    np.testing.assert_allclose(
        np.asarray(v2[:, -1]),
        np.asarray((x[:, t - 1 :] @ p["to_v"]["kernel"])[:, 0]),
        rtol=1e-5,
    )


def _randomize_proj_out(params, c, scale=0.3):
    # zero-init proj_out makes the module the identity; randomize it so the
    # tests exercise a non-trivial module
    import flax

    params = flax.core.unfreeze(params)
    params["params"]["proj_out"]["kernel"] = scale * jnp.asarray(
        np.random.RandomState(1).randn(c, c), jnp.float32
    )
    return params


def test_collect_matches_call_and_seeds_exact_kv_chain():
    """With a single attention block per transformer block, every attention
    input is a pure per-frame function of the module input, so a kv_step
    from a cache collected over frames 0..T−2 reproduces the full-window
    module output for the last frame EXACTLY (the design's key property).

    Own seeded rng (not the shared session fixture): the collect-vs-call
    comparison is at fp32-associativity tolerance, so the compared values
    are input-dependent — the shared rng's stream shifts whenever tests
    are added or deselected elsewhere (e.g. the ``-m "not slow"`` lane)."""
    cfg = MotionModuleConfig(
        num_heads=4, temporal_max_len=8, num_attention_blocks=1
    )
    b, t, h, w, c = 1, 6, 3, 4, 32
    mod = TemporalModule(cfg, c, attn_impl="xla")
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.randn(b, t, h, w, c), jnp.float32)
    params = _randomize_proj_out(mod.init(jax.random.PRNGKey(0), x), c)

    full = mod.apply(params, x)
    full2, caches_all = mod.apply(params, x, method="collect")
    # collect computes to_k(x)+to_k(pe) instead of to_k(x+pe): identical in
    # exact arithmetic (bias-free), fp32-associativity-level difference only
    np.testing.assert_allclose(
        np.asarray(full2), np.asarray(full), rtol=1e-4, atol=1e-6
    )

    # seed from the first T−1 frames only, then kv_step the last frame
    _, caches = mod.apply(params, x[:, : t - 1], method="collect")
    out, new_caches = mod.apply(params, x[:, t - 1 :], caches, method="kv_step")
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(full[:, -1]), rtol=1e-4, atol=1e-5
    )
    # cache sizes preserved after eviction
    for blk_old, blk_new in zip(caches, new_caches):
        for (ko, vo), (kn, vn) in zip(blk_old, blk_new):
            assert kn.shape == ko.shape and vn.shape == vo.shape


def test_kv_chain_two_attention_blocks_semantics(rng):
    """With the production config (2 attention blocks), the second block's
    cached K/V were computed when their frame was newest — KV streaming is
    a deliberately different computation from full-window recompute (the
    reference's CrossAtt variant has the same property).  Pin that the
    deviation stays small for a one-frame window difference."""
    cfg = MotionModuleConfig(num_heads=4, temporal_max_len=8)
    b, t, h, w, c = 1, 6, 3, 4, 32
    mod = TemporalModule(cfg, c, attn_impl="xla")
    x = jnp.asarray(rng.randn(b, t, h, w, c), jnp.float32)
    params = _randomize_proj_out(mod.init(jax.random.PRNGKey(0), x), c)

    full = mod.apply(params, x)
    _, caches = mod.apply(params, x[:, : t - 1], method="collect")
    out, _ = mod.apply(params, x[:, t - 1 :], caches, method="kv_step")
    want = np.asarray(full[:, -1])
    got = np.asarray(out[:, 0])
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-8)
    # random weights are adversarial for this comparison (no smoothness);
    # measured ~0.09 — pin an upper bound to catch gross wiring regressions
    assert rel < 0.2, rel


def test_kv_step_rope_positions_stay_relative(rng):
    """RoPE variant: caches are unrotated; rotation happens at attend time
    per current slot — a kv_step from frames 0..T−2 equals full attention
    over T frames (same relative positions)."""
    cfg = MotionModuleConfig(
        num_heads=4, temporal_max_len=8, pos_embedding_type="rope"
    )
    dim = 32
    b, t, s = 1, 5, 3
    attn = TemporalSelfAttention(cfg, dim, attn_impl="xla")
    x = jnp.asarray(rng.randn(b, t, s, dim), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    full = attn.apply(params, x)
    _, kf, vf = attn.apply(params, x[:, : t - 1], method="call_collect")
    out, _, _ = attn.apply(params, x[:, t - 1 :], kf, vf, method="kv_step")
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(full[:, -1]), rtol=1e-5, atol=1e-5
    )


def test_ape_projection_commutes(rng):
    """The design invariant: bias-free projection commutes with the APE add
    (to_k(x+pe) == to_k(x) + to_k(pe)) — guards against someone adding a
    bias to to_q/k/v and silently breaking the cache math."""
    cfg = MotionModuleConfig(num_heads=4, temporal_max_len=8)
    dim = 32
    attn = TemporalSelfAttention(cfg, dim, attn_impl="xla")
    x = jnp.asarray(rng.randn(1, 4, 3, dim), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    p = params["params"]
    assert "bias" not in p["to_q"] and "bias" not in p["to_k"] and "bias" not in p["to_v"]
    pe = jnp.asarray(sinusoidal_position_table(8, dim)[:4, None, :])
    lhs = (x + pe) @ p["to_k"]["kernel"]
    rhs = x @ p["to_k"]["kernel"] + pe @ p["to_k"]["kernel"]
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-5, atol=1e-6)
