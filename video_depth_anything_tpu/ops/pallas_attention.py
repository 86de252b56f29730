"""Pallas TPU flash-attention kernel for the spatial (patch-token) shape.

The ViT's dense attention materializes (B·T, heads, N, N) fp32 scores in
HBM — at vitl/518² that is ~3.8 GB per block and makes the encoder
HBM-bound (~14% MFU measured).  This kernel runs the classic
online-softmax flash pattern entirely in VMEM: grid (batch·heads,
q-blocks, kv-blocks), fp32 running max/sum/accumulator in scratch that
persists across the sequential kv-block grid dimension, bf16 QK^T and PV
GEMMs on the MXU with fp32 accumulation.

Shape contract: ``q, k, v : (BH, N_padded, D)`` with ``N_padded`` a
multiple of the block size; ``n_valid`` marks the real token count and the
tail columns are masked to −∞ (pad *rows* compute garbage that the wrapper
slices off).  ``try_spatial_attention`` adapts the model's ``(..., N, H,
D)`` layout, pads, dispatches, and falls back (returns ``None``) for
shapes the kernel does not cover.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, n_valid, block_k, num_k
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale
    # mask pad columns (only the last block can contain them; the compare is
    # cheap enough to apply unconditionally)
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "n_valid", "block_q", "block_k", "interpret")
)
def flash_attention_bhnd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    n_valid: int,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``q, k, v: (BH, Np, D)`` (Np % block == 0) → ``(BH, Np, D)``."""
    bh, n_pad, d = q.shape
    block_q = min(block_q, n_pad)
    block_k = min(block_k, n_pad)
    num_q = n_pad // block_q
    num_k = n_pad // block_k

    kernel = functools.partial(
        _flash_kernel, scale=scale, n_valid=n_valid, block_k=block_k, num_k=num_k
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def spatial_flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, interpret: bool = False
) -> jnp.ndarray:
    """Model-layout adapter: ``(B, N, H, D)`` → flash → ``(B, N, H, D)``."""
    b, n, h, d = q.shape
    block_q, block_k = 256, 512
    n_pad = _round_up(n, max(block_q, block_k) if n >= 512 else 128)
    if n_pad < 512:
        block_q = block_k = 128

    def to_bhnd(x):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        return x

    out = flash_attention_bhnd(
        to_bhnd(q),
        to_bhnd(k),
        to_bhnd(v),
        scale=scale,
        n_valid=n,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )
    out = out[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out


def try_spatial_attention(q, k, v, scale):
    """Dispatch gate used by ``ops.attention``: 4-D (B, N, H, D) inputs with
    MXU-friendly head_dim and a sequence long enough to benefit."""
    if q.ndim != 4:
        return None
    b, n, h, d = q.shape
    if d % 64 != 0 or n < 256:
        return None
    return spatial_flash_attention(q, k, v, scale)
