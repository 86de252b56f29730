"""Fused output-stack tail kernel (ops/pallas_output_stack.py) vs the XLA
reference chain, in Pallas interpret mode on CPU.

The kernel's numerics contract (module docstring): identical interpolation
tap weights and fp32 arithmetic with the separable passes swapped, conv
accumulation order differences at fp32-rounding level — everything lands
within ~1 bf16 ulp (2^-8) of the XLA chain, which is the same noise floor
the bf16 model path already carries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_depth_anything_tpu.ops.pallas_output_stack import (
    fused_output_tail,
    try_fused_output_tail,
    xla_output_tail,
)

BF16_ULP = 2.0**-8


def _random_case(rng, n, h, w, c):
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, 32)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((32,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((1, 1, 32, 1)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((1,)) * 0.1, jnp.float32)
    return x, k1, b1, k2, b2


@pytest.mark.parametrize(
    "n,h,w,c,oh,ow",
    [
        (2, 16, 16, 32, 28, 28),    # vits-like channels, 14-multiple output
        (1, 24, 20, 64, 42, 35),    # vitb channels, rectangular, odd out_w
        (1, 8, 12, 128, 14, 21),    # vitl channels, tiny
        (1, 32, 32, 32, 56, 56),    # 8·ph → 14·ph (the real head ratio)
        (1, 16, 16, 32, 12, 10),    # downscale path
        (4, 16, 16, 32, 28, 28),    # 4-frame lane packing (vits groups=4)
        (4, 16, 16, 64, 28, 28),    # 2-frame lane packing (vitb groups=2)
    ],
)
@pytest.mark.slow
def test_fused_tail_matches_xla_chain(n, h, w, c, oh, ow):
    rng = np.random.default_rng(hash((n, h, w, c, oh, ow)) % 2**32)
    x, k1, b1, k2, b2 = _random_case(rng, n, h, w, c)
    ref = np.asarray(xla_output_tail(x, k1, b1, k2, b2, oh, ow), np.float32)
    got = try_fused_output_tail(x, k1, b1, k2, b2, oh, ow, interpret=True)
    assert got is not None
    got = np.asarray(got, np.float32)
    assert got.shape == (n, oh, ow, 1)
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got / scale, ref / scale, atol=2.5 * BF16_ULP)


def test_dispatch_gate_rejects_uncovered():
    rng = np.random.default_rng(0)
    x, k1, b1, k2, b2 = _random_case(rng, 1, 16, 16, 32)
    # wrong dtype
    assert (
        try_fused_output_tail(
            x.astype(jnp.float32), k1, b1, k2, b2, 28, 28, interpret=True
        )
        is None
    )
    # unsupported channel count
    x48 = jnp.asarray(rng.standard_normal((1, 16, 16, 48)), jnp.bfloat16)
    k48 = jnp.asarray(rng.standard_normal((3, 3, 48, 32)), jnp.float32)
    assert (
        try_fused_output_tail(x48, k48, b1, k2, b2, 28, 28, interpret=True)
        is None
    )


@pytest.mark.slow
def test_fused_tail_gradients_match_xla_chain():
    rng = np.random.default_rng(7)
    x, k1, b1, k2, b2 = _random_case(rng, 1, 16, 16, 32)

    def loss(fn):
        def f(x, k1, b1, k2, b2):
            out = fn(x, k1, b1, k2, b2)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)

    g_fused = loss(lambda *a: fused_output_tail(*a, 28, 28, True))
    g_xla = loss(lambda *a: xla_output_tail(*a, 28, 28))
    for gf, gx in zip(g_fused, g_xla):
        gf = np.asarray(gf, np.float32)
        gx = np.asarray(gx, np.float32)
        scale = np.abs(gx).max() + 1e-6
        np.testing.assert_allclose(gf / scale, gx / scale, atol=3 * BF16_ULP)
