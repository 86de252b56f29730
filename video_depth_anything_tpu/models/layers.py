"""Shared NHWC conv / norm primitives.

Thin, explicit wrappers so every parameter has a deterministic name and
layout for the checkpoint converter.  Convs are NHWC/HWIO
(``lax.conv_general_dilated`` — MXU-native); the two kernel==stride
transposed convs in the DPT resize stack are expressed as a GEMM + pixel
shuffle, which is exact for padding-0/k==s deconvs (reference
``video_depth_anything/dpt.py:70-90``) and keeps the op on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DTypeDense(nn.Module):
    """Dense that computes in the *input* dtype (params cast down), unlike
    ``nn.Dense(dtype=None)`` which promotes bf16 activations to fp32 against
    fp32 params.  Needed for setup-style modules where the activation dtype
    is unknown at construction.  Param names match ``nn.Dense``."""

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features)
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class DTypeLayerNorm(nn.Module):
    """LayerNorm matching ``nn.LayerNorm(dtype=x.dtype)`` numerics for
    setup-style modules: fp32 statistics and affine (flax's
    force_float32_reductions), result cast back to the input dtype.  Param
    names match ``nn.LayerNorm``."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = jnp.maximum(
            (xf * xf).mean(axis=-1, keepdims=True) - mean * mean, 0.0
        )
        y = (xf - mean) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        return y.astype(x.dtype)


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _s2d_profitable(cin: int, cout: int) -> bool:
    """True when the space-to-depth formulation beats XLA's lane padding.

    The MXU pads both channel dims to 128 lanes, so a small-channel conv
    computes ``pad(cin)·pad(cout)`` MACs per pixel instead of ``cin·cout``
    (16× waste at 32→32 — measured 18.7 ms vs ~1 ms floor for the DPT
    output stack, docs/PERFORMANCE.md).  Packing 2×2 pixels into channels
    quadruples both dims and quarters the pixels: cost ratio
    ``pad(4cin)·pad(4cout)/4`` vs ``pad(cin)·pad(cout)``."""
    return _pad128(4 * cin) * _pad128(4 * cout) // 4 < _pad128(cin) * _pad128(cout)


def _s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) conv kernel → its (3, 3, 4Ci, 4Co) space-to-depth
    equivalent.  Packed channel order is (sub_y, sub_x, c); output sub-pixel
    (dy, dx) reading tap (ty, tx) hits original row ``u = 2·oy + sy`` with
    ``u = dy + ty − 1``, so each (cell-offset, sub-in, sub-out) block is a
    plain copy of one tap — zeros elsewhere (the packed conv runs 4× the
    true MACs instead of XLA's 16× lane padding at 32 channels)."""
    if kernel.shape[0] == kernel.shape[1] == 1:
        # 1×1 conv: each sub-pixel maps to itself — block-diagonal kernel.
        ci, co = kernel.shape[2], kernel.shape[3]
        out = jnp.zeros((1, 1, 4 * ci, 4 * co), dtype=kernel.dtype)
        for sub in range(4):
            out = out.at[
                0, 0, sub * ci : (sub + 1) * ci, sub * co : (sub + 1) * co
            ].set(kernel[0, 0])
        return out
    ci, co = kernel.shape[2], kernel.shape[3]
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), dtype=kernel.dtype)
    for dy in range(2):
        for ty in range(3):
            u = dy + ty - 1
            oy, sy = u // 2, u % 2
            for dx in range(2):
                for tx in range(3):
                    v = dx + tx - 1
                    ox, sx = v // 2, v % 2
                    out = out.at[
                        oy + 1,
                        ox + 1,
                        (sy * 2 + sx) * ci : (sy * 2 + sx + 1) * ci,
                        (dy * 2 + dx) * co : (dy * 2 + dx + 1) * co,
                    ].set(kernel[ty, tx])
    return out


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h2 * 2, w2 * 2, c)


class Conv2d(nn.Module):
    """NHWC conv with torch-compatible hyper-parameters.

    Note on small-channel convs: the MXU pads both channel dims to 128
    lanes, so the 32-channel DPT output stack computes ~16× its true MACs.
    A space-to-depth reformulation (``_s2d_kernel`` below, exact and
    checkpoint-transparent) cuts that to 4× — but measured END-TO-END it
    LOSES: the three (B·T, 518, 518, 32)-scale pack/unpack relayouts around
    the resize cost more than the conv savings (vits window 117 → 134 ms).
    Kept as tested helpers for a future packed-end-to-end output stack
    (pack once before output_conv1, packed resize, unpack after conv2)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed: bool = False) -> jnp.ndarray:
        """``packed=True`` applies the same parameters to a 2×2 space-to-
        depth-packed input (4·C_in channels) and returns a packed output
        (4·C_out) — exact, checkpoint-transparent (the parameter keeps its
        unpacked shape/name).  Only defined for the shapes the s2d transform
        covers: 3×3/stride 1/pad 1 and 1×1/stride 1/pad 0."""
        in_ch = x.shape[-1] // 4 if packed else x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, in_ch, self.features)
        )
        kernel = kernel.astype(x.dtype)
        if packed:
            assert self.stride == 1 and (
                (k == 3 and self.padding == 1) or (k == 1 and self.padding == 0)
            ), "packed conv needs 3x3/s1/p1 or 1x1"
            kernel = _s2d_kernel(kernel)
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            bias = bias.astype(x.dtype)
            if packed:
                bias = jnp.tile(bias, 4)
            y = y + bias
        return y


class Deconv2dPixelShuffle(nn.Module):
    """ConvTranspose2d with kernel_size == stride, padding 0, as GEMM+reshape.

    Each input pixel independently produces a k×k output block:
    ``out[b, i*k+di, j*k+dj, o] = Σ_c x[b,i,j,c] · W[c, di, dj, o] + b[o]``.
    Parameter layout ``(C_in, k, k, C_out)`` (torch deconv weight is
    ``(C_in, C_out, kh, kw)`` — converter transposes).
    """

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (c, k, k, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwc,cpqo->bhpwqo", x, kernel.astype(x.dtype))
        y = y.reshape(b, h * k, w * k, self.features)
        return y + bias.astype(x.dtype)


class GroupNorm(nn.Module):
    """GroupNorm over the channel axis of (..., H, W, C) with per-sample
    statistics over (group channels × H × W), matching torch semantics."""

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        shape = xf.shape
        grouped = xf.reshape(shape[:-3] + (-1,) + (g, c // g))
        # (..., H*W, g, c/g): reduce over spatial and intra-group channels.
        mean = grouped.mean(axis=(-3, -1), keepdims=True)
        var = grouped.var(axis=(-3, -1), keepdims=True)
        grouped = (grouped - mean) * jax.lax.rsqrt(var + self.epsilon)
        xf = grouped.reshape(shape)
        return (xf * scale + bias).astype(orig_dtype)
