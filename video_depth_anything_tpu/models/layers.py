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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class Conv2d(nn.Module):
    """NHWC conv with torch-compatible hyper-parameters."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, in_ch, self.features)
        )
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(x.dtype)
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
