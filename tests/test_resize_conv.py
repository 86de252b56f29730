"""Fused [2× bilinear resize → conv3×3] kernel (ops/pallas_resize_conv.py)
vs the XLA reference pair, in Pallas interpret mode on CPU.

The kernel is a measured-and-rejected model integration (it loses to the
XLA pair on v5e, 21.6 vs 18.4 ms at the vitl junction shape — XLA already
folds the 1x1/conv chain around its resize GEMMs); it is kept as a tested
standalone op and a record of the experiment (docs/PERFORMANCE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_depth_anything_tpu.ops.pallas_resize_conv import (
    try_fused_resize_conv,
    xla_resize_conv,
)

BF16_ULP = 2.0**-8


def _case(rng, n, h, w, c, cout=128):
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    return x, k, b


@pytest.mark.parametrize(
    "n,h,w,c",
    [
        (2, 16, 16, 256),   # vitl junction channels
        (1, 12, 20, 256),   # rectangular
        (1, 16, 16, 128),   # single-lane-block input
        (3, 8, 8, 256),     # tiny, odd frame count
    ],
)
@pytest.mark.slow
def test_fused_resize_conv_matches_xla_pair(n, h, w, c):
    rng = np.random.default_rng(hash((n, h, w, c)) % 2**32)
    x, k, b = _case(rng, n, h, w, c)
    oh, ow = 2 * h, 2 * w
    ref = np.asarray(xla_resize_conv(x, k, b, oh, ow), np.float32)
    got = try_fused_resize_conv(x, k, b, oh, ow, interpret=True)
    assert got is not None
    got = np.asarray(got, np.float32)
    assert got.shape == (n, oh, ow, 128)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=2.5 * BF16_ULP)


def test_gate_rejects_uncovered():
    rng = np.random.default_rng(0)
    x, k, b = _case(rng, 1, 16, 16, 256)
    # fp32 input → XLA path
    assert try_fused_resize_conv(
        x.astype(jnp.float32), k, b, 32, 32, interpret=True
    ) is None
    # non-lane-full input channels
    x96, k96, b96 = _case(rng, 1, 16, 16, 96)
    assert try_fused_resize_conv(x96, k96, b96, 32, 32, interpret=True) is None
    # cout != 128 (small heads keep the packed XLA stack)
    x2, k64, b64 = _case(rng, 1, 16, 16, 256, cout=64)
    assert try_fused_resize_conv(x2, k64, b64, 32, 32, interpret=True) is None


def test_fused_resize_conv_gradient_matches_xla():
    rng = np.random.default_rng(7)
    x, k, b = _case(rng, 1, 8, 8, 256)

    # value-independent cotangent: the bf16 forward values of the two paths
    # differ at rounding level, which a value-dependent loss would amplify
    gw = jnp.asarray(rng.standard_normal((1, 16, 16, 128)), jnp.float32)

    def f_fused(x, k, b):
        return jnp.sum(
            try_fused_resize_conv(x, k, b, 16, 16, interpret=True) * gw
        )

    def f_xla(x, k, b):
        return jnp.sum(xla_resize_conv(x, k, b, 16, 16) * gw)

    gf = jax.grad(f_fused, argnums=(0, 1, 2))(x, k, b)
    gx = jax.grad(f_xla, argnums=(0, 1, 2))(x, k, b)
    for a, bb in zip(gf, gx):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            rtol=0.1, atol=0.1,
        )
