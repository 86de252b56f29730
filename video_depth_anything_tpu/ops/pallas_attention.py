"""Pallas TPU flash-attention kernel for the spatial (patch-token) shape.

The ViT's dense attention materializes (B·T, heads, N, N) fp32 scores in
HBM — at vitl/518² that is ~3.8 GB per block and makes the encoder
HBM-bound (~14% MFU measured).  This kernel runs the online-softmax flash
pattern entirely in VMEM: grid (batch·heads, q-blocks, kv-blocks), fp32
running max/sum/accumulator scratch persisting across the sequential
kv-block grid dimension, bf16 QK^T and PV GEMMs on the MXU.

Tuning notes (measured on v5e through this repo's bench scripts):

* At N≈1370 the workload is **VPU-bound**, not MXU-bound: the elementwise
  max/sub/exp/sum chain over the fp32 score tile costs more than both
  GEMMs.  Hence (a) coarse grids — the whole kv row in one block when it
  fits VMEM (fine grids pay µs-scale per-invocation overhead across ~10k
  programs: 19 ms → 10 ms just from coarsening), (b) ``q`` is pre-scaled so
  the kernel never touches the score tile for scaling, and (c) an optional
  ``softmax_dtype=bfloat16`` halves VPU traffic for the bf16 model path
  (~0.3% relative output change; fp32 default bit-matches the XLA
  reference within 1e-3).

Shape contract: ``q: (BH, Nq_pad, D)``, ``k, v: (BH, Nk_pad, D)``;
``n_valid`` marks the real token count.  Pad handling costs nothing per
element: V is augmented with a ones column (zero on pad rows) so the PV
GEMM emits ``[acc | Σp]`` in its otherwise-idle output lanes — no mask
pass, no row-sum pass, no scratch for ``l`` (pad *rows* compute garbage
that the wrapper slices off).  ``try_spatial_attention`` adapts the model's ``(..., N, H,
D)`` layout, pads, dispatches, and falls back (returns ``None``) for
shapes the kernel does not cover.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    acc_ref,
    m_ref,
    *,
    d,
    num_k,
    softmax_dtype,
):
    """Streaming-KV flash kernel.  The softmax row sum rides the ones
    column of the augmented V (lane ``d``) through the PV GEMM — it is just
    one more accumulator lane, rescaled by the same online ``alpha``; the
    classic l scratch/row-sum pass does not exist."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # pre-scaled by the wrapper
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp((s - m_new).astype(softmax_dtype))
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:, :d] / acc_ref[:, d : d + 1]).astype(o_ref.dtype)


def _flash_kernel_single(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    d,
    softmax_dtype,
):
    """Whole-KV-row specialization (the tuned config at N≈1370): a plain
    single-pass softmax with no online-update state and no scratch traffic.
    The max/sub/exp chain over the fp32 score tile dominates (VPU-bound,
    docs/PERFORMANCE.md), so every saved elementwise pass counts:

    * no mask pass — V carries a ones column (lane ``d``) that is zero on
      pad rows, so pad key columns contribute to neither the accumulator
      nor the row sum;
    * no row-sum pass — the ones column makes the PV GEMM emit
      ``[acc | Σp]`` in the same MXU passes (the d=64 output only filled
      half the 128 output lanes anyway)."""
    q = q_ref[0]  # pre-scaled by the wrapper
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp((s - m).astype(softmax_dtype))
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc[:, :d] / acc[:, d : d + 1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "n_valid", "block_q", "block_k", "softmax_dtype", "interpret"),
)
def flash_attention_bhnd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    n_valid: int,
    block_q: int = 512,
    block_k: int = 0,
    softmax_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """``q: (BH, Nq, D)``, ``k, v: (BH, Nk, D)`` (each N a multiple of its
    block) → ``(BH, Nq, D)``.  ``Nq`` may be padded less than ``Nk`` (query
    rows only need sublane alignment; key columns need lane alignment) —
    every padded q row is pure wasted VPU work in the softmax chain.

    ``block_k=0`` means "whole kv row in one block" (preferred while the
    fp32 score tile fits VMEM)."""
    bh, n_pad_q, d = q.shape
    n_pad = k.shape[1]
    if block_k == 0:
        block_k = n_pad
    block_q = min(block_q, n_pad_q)
    block_k = min(block_k, n_pad)
    num_q = n_pad_q // block_q
    num_k = n_pad // block_k

    @jax.custom_vjp
    def attn(q, k, v):
        return _flash_forward(
            q, k, v,
            scale=scale, n_valid=n_valid, block_q=block_q, block_k=block_k,
            num_q=num_q, num_k=num_k, softmax_dtype=softmax_dtype,
            interpret=interpret,
        )

    def attn_fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def attn_bwd(res, g):
        # Dense einsum backward (training path): recomputes the masked
        # softmax instead of saving the score tensor.  Fine at training
        # resolutions; a flash backward kernel is a roadmap item for
        # full-res fine-tuning (the (BH, N, N) fp32 probabilities are the
        # memory cost here).
        q, k, v = res
        f32 = jnp.float32
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        ) * f32(scale)
        if n_valid < num_k * block_k:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        pv = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            pv, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
        ).astype(v.dtype)
        dp = jax.lax.dot_general(
            g, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * f32(scale)).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
        ).astype(q.dtype)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=f32
        ).astype(k.dtype)
        return dq, dk, dv

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(q, k, v)


def _flash_forward(
    q, k, v, *, scale, n_valid, block_q, block_k, num_q, num_k,
    softmax_dtype, interpret,
):
    bh, n_pad_q, d = q.shape
    n_pad = k.shape[1]
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    # Augment V with a ones column at lane d (zero on pad rows): the PV
    # GEMM then emits [acc | Σp] in the same MXU passes (d=64 output lanes
    # were half-empty), removing both the fp32 row-sum pass over the score
    # tile and any pad handling.  Requires a spare output lane (d % 128).
    assert d % 128 != 0, "augmented-V flash kernel needs a spare lane"
    dv = _round_up(d + 1, 128)
    valid = np.arange(n_pad) < n_valid
    ones_col = jnp.broadcast_to(
        jnp.asarray(valid, v.dtype)[None, :, None], (bh, n_pad, 1)
    )
    pad_lanes = jnp.zeros((bh, n_pad, dv - d - 1), v.dtype)
    v = jnp.concatenate([v, ones_col, pad_lanes], axis=2)

    if num_k == 1:
        kernel = functools.partial(
            _flash_kernel_single, d=d, softmax_dtype=softmax_dtype
        )
        return pl.pallas_call(
            kernel,
            grid=(bh, num_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, block_k, dv), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(q, k, v)

    kernel = functools.partial(
        _flash_kernel, d=d, num_k=num_k, softmax_dtype=softmax_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, num_q, num_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dv), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, dv), jnp.float32),
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
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Model-layout adapter: ``(B, N, H, D)`` → flash → ``(B, N, H, D)``."""
    b, n, h, d = q.shape
    # whole-row kv while the fp32 score tile stays comfortably inside VMEM;
    # stream kv in 512-blocks beyond that.  n_pad must be a multiple of
    # block_q (rows) and block_k (columns); minimizing n_pad matters because
    # the VPU-bound softmax cost scales with padded columns (1536→1408 pad
    # at N=1370 measured ~6% faster).
    if _round_up(n, 128) <= 2048:
        n_pad = _round_up(n, 128)
        block_k = n_pad
        if n_pad <= 1408:
            # Whole-row q block: one program per (batch·head) — measured
            # fastest at the vitl shape (7.44 vs 7.62 ms at block_q 704,
            # docs/PERFORMANCE.md); the fp32 score tile tops out ≈ 8 MB,
            # comfortably inside VMEM with the single-pass kernel's zero
            # scratch.  Query rows only need sublane (16) alignment — 1376
            # instead of 1408 at N=1370 trims 2.3% off the VPU-bound
            # softmax chain (pad columns still need the lane-aligned 1408).
            n_pad_q = _round_up(n, 16)
            block_q = n_pad_q
        else:
            # largest row block ≤768 (sublane-aligned) that divides n_pad
            n_pad_q = n_pad
            block_q = max(
                bq for bq in range(8, min(n_pad, 768) + 1, 8) if n_pad % bq == 0
            )
    else:
        block_q, block_k = 512, 512
        n_pad = _round_up(n, 512)
        n_pad_q = n_pad

    # (B, N, H, D) -> (B*H, N, D): Mosaic requires the last two block dims
    # to be (8, 128)-divisible, which rules out per-head blocking of the
    # native layout; the transposes cost ~2 ms at the vitl shape.
    def to_bhnd(x, pad_to):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, n, d)
        if pad_to != n:
            x = jnp.pad(x, ((0, 0), (0, pad_to - n), (0, 0)))
        return x

    out = flash_attention_bhnd(
        to_bhnd(q, n_pad_q),
        to_bhnd(k, n_pad),
        to_bhnd(v, n_pad),
        scale=scale,
        n_valid=n,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )
    return out[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)


def try_spatial_attention(q, k, v, scale):
    """Dispatch gate used by ``ops.attention``: 4-D (B, N, H, D) inputs with
    MXU-friendly head_dim and a sequence long enough to benefit."""
    if q.ndim != 4:
        return None
    b, n, h, d = q.shape
    if d % 64 != 0 or d % 128 == 0 or n < 256:
        # d % 128 == 0 would leave no spare lane for the augmented-V row sum
        return None
    return spatial_flash_attention(q, k, v, scale)
