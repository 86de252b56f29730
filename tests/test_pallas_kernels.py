"""Pallas kernels vs the XLA reference implementation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_depth_anything_tpu.ops.attention import _xla_attention
from video_depth_anything_tpu.ops.pallas_attention import spatial_flash_attention


@pytest.mark.parametrize(
    "b,n,h,d",
    [
        (2, 300, 2, 64),     # pad 300 -> 384/512 path
        (1, 1370, 3, 64),    # the real ViT shape (518²)
        (2, 512, 2, 64),     # exact multiple
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
