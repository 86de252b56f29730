"""Pallas kernels vs the XLA reference implementation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_depth_anything_tpu.ops.attention import _xla_attention
from video_depth_anything_tpu.ops.pallas_attention import spatial_flash_attention


@pytest.mark.parametrize(
    "b,n,h,d",
    [
        (2, 300, 2, 64),     # pad 300 -> 384/512 path
        (1, 1370, 3, 64),    # the real ViT shape (518²)
        (2, 512, 2, 64),     # exact multiple
        (1, 2500, 2, 64),    # > 2048: streaming-KV multi-block kernel
    ],
)
def test_flash_matches_xla(rng, b, n, h, d):
    q = rng.randn(b, n, h, d).astype(np.float32) * 0.5
    k = rng.randn(b, n, h, d).astype(np.float32) * 0.5
    v = rng.randn(b, n, h, d).astype(np.float32)
    scale = d**-0.5
    want = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    got = np.asarray(
        spatial_flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize(
    "n",
    [
        300,    # single-pass padded path
        1370,   # the real ViT shape
        2500,   # streaming-KV multi-block fast kernel (no-rescale accumulate)
    ],
)
def test_flash_fast_softmax_matches_xla(rng, n):
    # The no-max exp2 softmax is the same quotient as the exact path as
    # long as scaled logits stay in fp32's exp2 domain; on these inputs
    # (|raw logits| ≲ 40·scale) it must agree to normal tolerance.
    b, h, d = 1, 2, 64
    q = rng.randn(b, n, h, d).astype(np.float32) * 0.5
    k = rng.randn(b, n, h, d).astype(np.float32) * 0.5
    v = rng.randn(b, n, h, d).astype(np.float32)
    scale = d**-0.5
    want = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    got = np.asarray(
        spatial_flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
            fast_softmax=True, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_fast_softmax_large_logits(rng):
    # Adversarial logit magnitudes: scaled scores near ±60 (raw q·k ~ ±480)
    # still stay inside the exp2 domain and must not produce inf/nan.
    b, n, h, d = 1, 256, 1, 64
    q = rng.randn(b, n, h, d).astype(np.float32) * 4.0
    k = rng.randn(b, n, h, d).astype(np.float32) * 4.0
    v = rng.randn(b, n, h, d).astype(np.float32)
    scale = d**-0.5
    want = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    got = np.asarray(
        spatial_flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale,
            fast_softmax=True, interpret=True,
        )
    )
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("n,h,fast", [(300, 2, False), (1370, 6, False), (700, 4, True)])
def test_flash_native_layout_matches_xla(rng, n, h, fast):
    from video_depth_anything_tpu.ops.pallas_attention import flash_attention_native

    b, d = 2, 64
    q = rng.randn(b, n, h, d).astype(np.float32) * 0.5
    k = rng.randn(b, n, h, d).astype(np.float32) * 0.5
    v = rng.randn(b, n, h, d).astype(np.float32)
    scale = d**-0.5
    want = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))
    got = np.asarray(
        flash_attention_native(
            jnp.asarray(q.reshape(b, n, h * d)),
            jnp.asarray(k.reshape(b, n, h * d)),
            jnp.asarray(v.reshape(b, n, h * d)),
            scale=scale, n_valid=n, num_heads=h, fast_softmax=fast,
            interpret=True,
        )
    ).reshape(b, n, h, d)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_native_grads_match_xla(rng):
    from video_depth_anything_tpu.ops.pallas_attention import flash_attention_native

    b, n, h, d = 1, 300, 2, 64
    q = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32))
    g = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32))
    scale = d**-0.5

    def ref_loss(q, k, v):
        out = _xla_attention(
            q.reshape(b, n, h, d), k.reshape(b, n, h, d), v.reshape(b, n, h, d), scale
        )
        return jnp.sum(out.reshape(b, n, h * d) * g)

    def ker_loss(q, k, v):
        out = flash_attention_native(
            q, k, v, scale=scale, n_valid=n, num_heads=h, interpret=True
        )
        return jnp.sum(out * g)

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("bwd_impl", ["pallas", "einsum"])
@pytest.mark.parametrize("fast", [False, True])
@pytest.mark.parametrize("n,h", [(142, 4), (300, 2)])
def test_flash_native_bwd_impls_match_xla(rng, bwd_impl, fast, n, h):
    """The flash backward kernel (softmax recompute + 5 GEMMs in VMEM) and
    the dense einsum backward must both match the XLA-attention gradient,
    including pad-row/column handling (n=142 pads 2 query sublanes and 114
    key lanes) and the fast (no-max) softmax recompute."""
    from video_depth_anything_tpu.ops.pallas_attention import flash_attention_native

    b, d = 2, 64
    q = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32))
    g = jnp.asarray(rng.randn(b, n, h * d).astype(np.float32))
    scale = d**-0.5

    def ref_loss(q, k, v):
        out = _xla_attention(
            q.reshape(b, n, h, d), k.reshape(b, n, h, d), v.reshape(b, n, h, d), scale
        )
        return jnp.sum(out.reshape(b, n, h * d) * g)

    def ker_loss(q, k, v):
        out = flash_attention_native(
            q, k, v, scale=scale, n_valid=n, num_heads=h,
            fast_softmax=fast, bwd_impl=bwd_impl, interpret=True,
        )
        return jnp.sum(out * g)

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v)
    for w, gt in zip(want, got):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), rtol=2e-3, atol=2e-3)


def test_flash_bf16(rng):
    b, n, h, d = 1, 300, 2, 64
    q = (rng.randn(b, n, h, d) * 0.5).astype(jnp.bfloat16)
    k = (rng.randn(b, n, h, d) * 0.5).astype(jnp.bfloat16)
    v = rng.randn(b, n, h, d).astype(jnp.bfloat16)
    scale = d**-0.5
    want = np.asarray(_xla_attention(q, k, v, scale), dtype=np.float32)
    got = np.asarray(
        spatial_flash_attention(q, k, v, scale, interpret=True), dtype=np.float32
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


# ---------------------------------------------------------------------------
# temporal (motion-module) attention kernel


def _temporal_reference(q, k, v, heads, scale):
    b, t, s, c = q.shape
    d = c // heads
    q5 = q.reshape(b, t, s, heads, d)
    k5 = k.reshape(b, t, s, heads, d)
    v5 = v.reshape(b, t, s, heads, d)
    scores = jnp.einsum(
        "bqshd,bkshd->bshqk", q5, k5, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bshqk,bkshd->bqshd", probs, v5, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out.reshape(b, t, s, c)


@pytest.mark.parametrize("reduce_impl", ["mxu", "vpu"])
@pytest.mark.parametrize(
    "s,c,heads",
    [
        (100, 256, 8),   # d=32 (vitl motion modules 2/3), S padded 100->128
        (64, 1024, 8),   # d=128 (vitl motion modules 0/1), 4 channel groups
        (37, 128, 4),    # d=32 single group, heavy S padding
        (100, 64, 8),    # d=8 (vits motion modules 2/3), 16x location packing
        (50, 192, 8),    # d=24 (vits module 0), 4x packing, S pad not mult of P
    ],
)
def test_temporal_kernel_matches_einsum(rng, s, c, heads, reduce_impl):
    from video_depth_anything_tpu.ops.pallas_temporal import (
        temporal_attention_window,
    )

    t = 32
    d = c // heads
    scale = d**-0.5
    q = jnp.asarray(rng.randn(2, t, s, c).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(2, t, s, c).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(2, t, s, c).astype(np.float32))
    want = np.asarray(_temporal_reference(q, k, v, heads, scale))
    got = np.asarray(
        temporal_attention_window(
            q, k, v, heads=heads, scale=scale, reduce_impl=reduce_impl,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_temporal_kernel_bf16(rng):
    from video_depth_anything_tpu.ops.pallas_temporal import (
        temporal_attention_window,
    )

    t, s, c, heads = 32, 50, 256, 8
    scale = (c // heads) ** -0.5
    q = (rng.randn(1, t, s, c) * 0.5).astype(jnp.bfloat16)
    k = (rng.randn(1, t, s, c) * 0.5).astype(jnp.bfloat16)
    v = rng.randn(1, t, s, c).astype(jnp.bfloat16)
    want = np.asarray(_temporal_reference(q, k, v, heads, scale), dtype=np.float32)
    got = np.asarray(
        temporal_attention_window(
            q, k, v, heads=heads, scale=scale, interpret=True
        ),
        dtype=np.float32,
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_temporal_kernel_grads_match_einsum(rng):
    """Training must differentiate through the Pallas temporal kernel: the
    custom VJP (einsum backward) has to match autodiff of the XLA path."""
    from video_depth_anything_tpu.ops.pallas_temporal import (
        temporal_attention_window,
    )

    t, s, c, heads = 8, 36, 128, 4
    scale = (c // heads) ** -0.5
    q = jnp.asarray(rng.randn(1, t, s, c).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(1, t, s, c).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(1, t, s, c).astype(np.float32))
    g = jnp.asarray(rng.randn(1, t, s, c).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_temporal_reference(q, k, v, heads, scale) * g)

    def loss_kernel(q, k, v):
        return jnp.sum(
            temporal_attention_window(
                q, k, v, heads=heads, scale=scale, interpret=True
            )
            * g
        )

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for w, gg in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(w), rtol=2e-3, atol=2e-3
        )


def test_spatial_flash_grads_match_xla(rng):
    """Training differentiates through the spatial flash kernel (encoder
    remat included): custom VJP must match autodiff of the dense path."""
    b, n, h, d = 1, 300, 2, 64
    scale = d**-0.5
    q = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32))
    g = jnp.asarray(rng.randn(b, n, h, d).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * g)

    def loss_kernel(q, k, v):
        return jnp.sum(
            spatial_flash_attention(q, k, v, scale, interpret=True) * g
        )

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for w, gg in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(w), rtol=2e-3, atol=2e-3
        )

    # and under remat, as the trainer wraps the encoder
    got_r = jax.grad(jax.checkpoint(loss_kernel), argnums=(0, 1, 2))(q, k, v)
    for w, gg in zip(want, got_r):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(w), rtol=2e-3, atol=2e-3
        )


def _motion_raw_params(params, cfg):
    p = params["params"]
    blk = p["block_0"]
    n = cfg.num_attention_blocks
    return dict(
        gn_scale=p["norm"]["scale"], gn_bias=p["norm"]["bias"],
        w_in=p["proj_in"]["kernel"], b_in=p["proj_in"]["bias"],
        ln_scale=jnp.stack(
            [blk[f"norm_{i}"]["scale"] for i in range(n)]
            + [blk["ff_norm"]["scale"]]
        ),
        ln_bias=jnp.stack(
            [blk[f"norm_{i}"]["bias"] for i in range(n)]
            + [blk["ff_norm"]["bias"]]
        ),
        wq=jnp.stack([blk[f"attn_{i}"]["to_q"]["kernel"] for i in range(n)]),
        wk=jnp.stack([blk[f"attn_{i}"]["to_k"]["kernel"] for i in range(n)]),
        wv=jnp.stack([blk[f"attn_{i}"]["to_v"]["kernel"] for i in range(n)]),
        wo=jnp.stack([blk[f"attn_{i}"]["to_out"]["kernel"] for i in range(n)]),
        bo=jnp.stack([blk[f"attn_{i}"]["to_out"]["bias"] for i in range(n)]),
        w1=blk["ff"]["proj"]["kernel"], b1=blk["ff"]["proj"]["bias"],
        w2=blk["ff"]["out"]["kernel"], b2=blk["ff"]["out"]["bias"],
        w_out=p["proj_out"]["kernel"], b_out=p["proj_out"]["bias"],
    )


@pytest.mark.parametrize(
    "c,s,t",
    [(256, 36, 8), (128, 25, 32), (64, 64, 8), (192, 36, 8)],
    # 256/128: aligned lane groups; 64/192: gunit=2 block-diagonal groups
)
@pytest.mark.slow
def test_fused_motion_module_matches_module(rng, c, s, t):
    """Whole-module fused kernel (ops/pallas_motion.py) vs TemporalModule:
    GroupNorm fold, packed lane-group GEMMs/LayerNorm, segment-matrix
    attend, GEGLU chunking, residuals — all in one program."""
    import flax

    from video_depth_anything_tpu.config import MotionModuleConfig
    from video_depth_anything_tpu.models.temporal import TemporalModule
    from video_depth_anything_tpu.ops.pallas_motion import (
        motion_module_reference,
        try_fused_motion_module,
    )

    cfg = MotionModuleConfig()
    hw = int(round(s**0.5))
    x5 = jnp.asarray(rng.randn(1, t, hw, hw, c) * 0.5, jnp.float32)
    mod = TemporalModule(cfg, c, "xla")
    params = flax.core.unfreeze(mod.init(jax.random.PRNGKey(1), x5))
    params["params"]["proj_out"]["kernel"] = jnp.asarray(
        rng.randn(c, c) * 0.05, jnp.float32
    )
    want = np.asarray(mod.apply(params, x5))

    raw = _motion_raw_params(params, cfg)
    x4 = x5.reshape(1, t, hw * hw, c)
    # raw-param XLA reference is exact vs the module (same math)
    ref = np.asarray(
        motion_module_reference(x4, raw, cfg, cfg.num_heads)
    ).reshape(want.shape)
    np.testing.assert_allclose(ref, want, rtol=1e-6, atol=1e-6)

    got = try_fused_motion_module(
        x4, raw, heads=cfg.num_heads, cfg=cfg, interpret=True
    )
    assert got is not None
    got = np.asarray(got).reshape(want.shape)
    denom = np.abs(want).max()
    np.testing.assert_allclose(got / denom, want / denom, rtol=0, atol=2e-4)


@pytest.mark.slow
def test_fused_motion_module_grads_match_reference(rng):
    """The custom VJP recomputes through the XLA reference — gradients of
    the fused op must match the reference's."""
    import flax

    from video_depth_anything_tpu.config import MotionModuleConfig
    from video_depth_anything_tpu.models.temporal import TemporalModule
    from video_depth_anything_tpu.ops.pallas_motion import (
        fused_motion_module,
        motion_module_reference,
    )

    cfg = MotionModuleConfig()
    c, s, t = 128, 16, 8
    hw = 4
    x5 = jnp.asarray(rng.randn(1, t, hw, hw, c) * 0.5, jnp.float32)
    mod = TemporalModule(cfg, c, "xla")
    params = flax.core.unfreeze(mod.init(jax.random.PRNGKey(1), x5))
    params["params"]["proj_out"]["kernel"] = jnp.asarray(
        rng.randn(c, c) * 0.05, jnp.float32
    )
    raw = _motion_raw_params(params, cfg)
    x4 = x5.reshape(1, t, hw * hw, c)

    def loss_fused(x, p):
        return jnp.sum(
            fused_motion_module(x, p, heads=cfg.num_heads, cfg=cfg,
                                interpret=True) ** 2
        )

    def loss_ref(x, p):
        return jnp.sum(
            motion_module_reference(x, p, cfg, cfg.num_heads) ** 2
        )

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x4, raw)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x4, raw)

    def close(a, b, msg):
        # The VJP recompute is exact, but the cotangent entering it is
        # 2·y_fused vs 2·y_ref — the kernel's ~2e-4 forward deviation
        # (tanh-vs-erf gelu) propagates through J^T: compare relative to
        # the gradient's scale.
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / denom, b / denom, rtol=0, atol=2e-3,
                                   err_msg=msg)

    close(gx_f, gx_r, "dx")
    for k in gp_f:
        close(gp_f[k], gp_r[k], k)
