"""Space-to-depth 3×3 conv reformulation (kept for a future packed output
stack — see models/layers.py note): must be exactly equivalent to the
direct conv for stride 1 / pad 1 on even maps."""

import numpy as np

import jax
import jax.numpy as jnp

from video_depth_anything_tpu.models.layers import (
    _depth_to_space,
    _s2d_kernel,
    _s2d_profitable,
    _space_to_depth,
)


def test_s2d_conv_equivalence(rng):
    for (h, w, ci, co) in [(8, 8, 32, 32), (10, 6, 64, 32), (14, 14, 3, 8)]:
        x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = _depth_to_space(
            jax.lax.conv_general_dilated(
                _space_to_depth(x), _s2d_kernel(k), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_s2d_conv_1x1_equivalence(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 32), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 32, 1) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = _depth_to_space(
        jax.lax.conv_general_dilated(
            _space_to_depth(x), _s2d_kernel(k), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_packed_bilinear_resize_matches_unpacked(rng):
    from video_depth_anything_tpu.ops.resize import (
        bilinear_resize,
        bilinear_resize_packed,
    )

    for (h, w, oh, ow, c) in [(296, 296, 518, 518, 8), (10, 14, 28, 18, 12)]:
        x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        want = np.asarray(bilinear_resize(x, oh, ow))
        got = np.asarray(
            _depth_to_space(bilinear_resize_packed(_space_to_depth(x), oh, ow))
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_packed_conv2d_module_matches_unpacked(rng):
    from video_depth_anything_tpu.models.layers import Conv2d

    x = jnp.asarray(rng.randn(2, 12, 10, 16), jnp.float32)
    for (k, p, co) in [(3, 1, 8), (1, 0, 8)]:
        mod = Conv2d(co, k, padding=p)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = np.asarray(mod.apply(params, x))
        got = np.asarray(
            _depth_to_space(mod.apply(params, _space_to_depth(x), packed=True))
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_output_head_packed_matches_unpacked(rng):
    """End-to-end: the packed DPT output stack equals the unpacked one."""
    import dataclasses

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.dpt import DPTHeadTemporal

    cfg = get_model_config("vits")
    assert dataclasses.replace(cfg, packed_output_stack=True)  # field exists
    ph = pw = 4
    x = jnp.asarray(rng.randn(6, 8 * ph, 8 * pw, cfg.features), jnp.float32)

    def run(packed):
        c = dataclasses.replace(cfg, packed_output_stack=packed)
        head = DPTHeadTemporal(c)
        params = head.init(
            jax.random.PRNGKey(1), x, ph, pw, method=DPTHeadTemporal._output_head
        )
        return head.apply(params, x, ph, pw, method=DPTHeadTemporal._output_head)

    want = np.asarray(run(False))
    got = np.asarray(run(True))
    assert got.shape == want.shape == (6, 14 * ph, 14 * pw, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_s2d_profitability_gate():
    assert _s2d_profitable(32, 32)        # 16x pad -> 4x
    assert _s2d_profitable(64, 32)        # 8x -> 4x
    assert not _s2d_profitable(64, 64)    # 4x -> 4x: no gain
    assert not _s2d_profitable(128, 32)   # 4x -> 4x: no gain
    assert not _s2d_profitable(256, 128)  # already lane-full
