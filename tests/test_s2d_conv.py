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


def test_s2d_profitability_gate():
    assert _s2d_profitable(32, 32)        # 16x pad -> 4x
    assert _s2d_profitable(64, 32)        # 8x -> 4x
    assert not _s2d_profitable(64, 64)    # 4x -> 4x: no gain
    assert not _s2d_profitable(128, 32)   # 4x -> 4x: no gain
    assert not _s2d_profitable(256, 128)  # already lane-full
