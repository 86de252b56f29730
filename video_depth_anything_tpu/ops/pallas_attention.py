"""Pallas TPU flash-attention kernel for the spatial (patch-token) shape.

The ViT's dense attention materializes (B·T, heads, N, N) fp32 scores in
HBM — at vitl/518² that is ~3.8 GB per block and makes the encoder
HBM-bound (~14% MFU measured).  This kernel runs the online-softmax flash
pattern entirely in VMEM: grid (batch·heads, q-blocks, kv-blocks), fp32
running max/sum/accumulator scratch persisting across the sequential
kv-block grid dimension, bf16 QK^T and PV GEMMs on the MXU.

Tuning notes (measured on v5e through this repo's bench scripts; history in
docs/PERFORMANCE.md):

* Coarse grids win at N≈1370: the whole kv row in one block when the fp32
  score tile fits VMEM (fine grids pay µs-scale per-invocation overhead
  across ~10k programs: 19 ms → 10 ms just from coarsening).
* The kernel is **GEMM-bound** once the elementwise chain is cheap enough
  to pipeline under the MXU: ``scripts/bench_softmax_chain.py`` shows the
  two GEMMs cost ~5.5 ms at the vitl shape while a ~10-cheap-op VPU chain
  hides completely — but the hardware ``exp``/``exp2`` transcendental does
  NOT (~1 ms/call extra).  Hence ``_exp2_poly``: exact-exponent bit
  assembly + degree-4 fraction polynomial (5.3e-6 rel err, an order below
  the bf16 cast the probabilities pass through anyway), with log2(e)
  folded into the q pre-scale.
* ``fast_softmax`` (the ``:fast`` impl suffix) additionally drops the
  row-max reduce + subtract — exact for logits inside fp32's exp2 domain
  (±88 natural units; trained ViT logits live within ±30).

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
_LOG2E = 1.4426950408889634

# Degree-4 relative-error LSQ fit of 2^f on [0, 1) (max rel err 5.3e-6,
# scripts/bench_softmax_chain.py notes) — an order of magnitude below the
# bf16 quantization the probabilities go through before the PV GEMM.
_EXP2_C = (1.00000526, 0.69297426, 0.241508857, 0.051989575, 0.0135115307)


def _exp2_poly(x: jnp.ndarray) -> jnp.ndarray:
    """2^x for fp32 ``x``: exact exponent assembled in the int32 exponent
    field + degree-4 polynomial for the fractional part.

    Why not ``jnp.exp``/``exp2``: the hardware transcendental costs ~1 ms per
    vitl-shape kernel call, while this ~10-op chain of cheap VPU ops
    pipelines completely under the kernel's MXU GEMMs (measured free —
    docs/PERFORMANCE.md).  Underflow (x < −127) clamps the biased exponent
    to 0 → +0.0; overflow clamps to 2^127·pf (callers keep x ≤ 0 via the
    row max, or rely on logits ≪ 127 in ":fast" mode)."""
    x = jnp.maximum(x, -200.0)  # keep the int conversion in-range
    xi = jnp.floor(x)
    xf = x - xi
    e = jnp.clip(xi.astype(jnp.int32) + 127, 0, 254)
    scale = jax.lax.bitcast_convert_type(e << 23, jnp.float32)
    c = _EXP2_C
    pf = c[0] + xf * (c[1] + xf * (c[2] + xf * (c[3] + xf * c[4])))
    return scale * pf


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
    # q carries scale·log2(e): the online state lives in the exp2 domain.
    p = _exp2_poly(s - m_new)
    alpha = _exp2_poly(m_prev - m_new)
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


def _flash_kernel_fast(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    acc_ref,
    *,
    d,
    num_k,
):
    """Streaming-KV variant of the fast (no-max) softmax: with no running
    max there is no rescale — just accumulate exp2 probabilities times V
    (the row sum still rides V's ones column)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # pre-scaled by scale·log2(e) in the wrapper
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = _exp2_poly(s)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
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
    fast,
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
    if fast:
        # No-max softmax: q carries scale·log2(e), so 2^s = e^{raw·scale}
        # and the softmax quotient is unchanged as long as no element over-
        # or underflows fp32: raw scaled logits must lie in (−103, 88)
        # (fp32 exp2 domain; trained ViT attention logits live within ±30).
        # Saves the row-max reduce and the broadcast subtract.
        p = _exp2_poly(s)
    else:
        m = jnp.max(s, axis=1, keepdims=True)
        p = _exp2_poly(s - m)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (acc[:, :d] / acc[:, d : d + 1]).astype(o_ref.dtype)


def _flash_kernel_native(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    *,
    d,
    n_valid,
    n_pad,
    fast,
):
    """Native-layout single-pass kernel: blocks are lane-slices of the
    model's ``(B, N, H·D)`` tensors — two d=64 heads fill one 128-lane
    block, handled sequentially by static lane slicing.  This removes the
    whole (BH, N, D) adaptation layer of the classic kernel: no head
    transposes, no V-augment concat, no per-tensor relayouts — the only
    wrapper work left is sublane/lane padding fused with the q pre-scale.
    The row sum returns to an in-kernel reduce and pad keys to one iota
    mask pass; both pipeline under the MXU GEMMs (scripts/
    bench_softmax_chain.py: cheap VPU chains are free in this kernel)."""
    nh = q_ref.shape[-1] // d
    for h in range(nh):
        lo = h * d
        q = q_ref[0, :, lo : lo + d]
        k = k_ref[0, :, lo : lo + d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        if fast:
            p = _exp2_poly(s)
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            p = _exp2_poly(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, :, lo : lo + d],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + d] = (acc / l).astype(o_ref.dtype)


def _flash_kernel_native_bwd(
    q_ref,  # pre-scaled by scale·log2(e), like the forward
    k_ref,
    v_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    d,
    n_valid,
    n_pad,
    fast,
    scale,
):
    """Native-layout flash backward: recompute the forward's probabilities
    (identical softmax arithmetic, incl. the ``fast`` no-max variant), then

        dv = pᵀ·g,  dp = g·vᵀ,  Δ = rowsum(dp⊙p),  ds = p⊙(dp−Δ),
        dq = scale·ds·k,  dk = dsᵀ·q_raw·scale = dsᵀ·q_pre / log2(e)

    per head, entirely in VMEM — the einsum backward's (B·H, N, N) fp32
    probability/ds tensors never touch HBM.  Pad handling mirrors the
    forward: pad key columns are masked to −∞ (p=0 ⇒ zero dk/dv rows), pad
    query rows have zero g ⇒ zero ds rows ⇒ zero dq rows and no dk/dv
    contribution."""
    nh = q_ref.shape[-1] // d
    for h in range(nh):
        lo = h * d
        q = q_ref[0, :, lo : lo + d]
        k = k_ref[0, :, lo : lo + d]
        v = v_ref[0, :, lo : lo + d]
        g = g_ref[0, :, lo : lo + d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if n_valid < n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, _NEG_INF)
        if fast:
            p = _exp2_poly(s)
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            p = _exp2_poly(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pn = p * (1.0 / l)
        pb = pn.astype(v_ref.dtype)
        dv_ref[0, :, lo : lo + d] = jax.lax.dot_general(
            pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(dp * pn, axis=1, keepdims=True)
        ds = (pn * (dp - delta)).astype(q_ref.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, :, lo : lo + d] = (dq * scale).astype(dq_ref.dtype)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_ref[0, :, lo : lo + d] = (dk * (1.0 / _LOG2E)).astype(dk_ref.dtype)


def _native_bwd_pallas(
    q, k, v, g, *, scale, n_valid, num_heads, fast, interpret
):
    """Launch the native-layout backward kernel on raw ``(B, N, H·D)``
    residuals + cotangent ``g``; returns ``(dq, dk, dv)`` in the same
    layout."""
    b, n, hd = q.shape
    d = hd // num_heads
    n_pad_q = _round_up(n, 16)
    n_pad = _round_up(n, 128)
    qp = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qp = jnp.pad(qp, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kernel = functools.partial(
        _flash_kernel_native_bwd,
        d=d, n_valid=n, n_pad=n_pad, fast=fast, scale=scale,
    )
    spec_q = pl.BlockSpec((1, n_pad_q, 2 * d), lambda bi, hp: (bi, 0, hp))
    spec_k = pl.BlockSpec((1, n_pad, 2 * d), lambda bi, hp: (bi, 0, hp))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, num_heads // 2),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad_q, hd), q.dtype),
            jax.ShapeDtypeStruct((b, n_pad, hd), k.dtype),
            jax.ShapeDtypeStruct((b, n_pad, hd), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp, gp)
    return dq[:, :n], dk[:, :n], dv[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "n_valid", "num_heads", "fast_softmax", "bwd_impl", "interpret",
    ),
)
def flash_attention_native(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    n_valid: int,
    num_heads: int,
    fast_softmax: bool = False,
    bwd_impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention on ``(B, N, H·D)`` inputs (head-interleaved lanes, the
    layout straight off the qkv split).  Requirements: D == 64 and H even
    (every supported encoder: 6/12/16/24 heads).  N is padded internally —
    q rows to sublane (16), key lanes to 128.

    ``bwd_impl``: "pallas" (flash backward kernel — recomputes the softmax
    in VMEM, nothing N×N touches HBM), "einsum" (dense XLA backward,
    materializes (B, H, N, N) fp32 probabilities — the memory cost that
    caps unfrozen-encoder training at high resolution), or "auto"
    (pallas)."""
    b, n, hd = q.shape
    d = hd // num_heads
    n_pad_q = _round_up(n, 16)
    n_pad = _round_up(n, 128)

    @jax.custom_vjp
    def attn(q, k, v):
        qp = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
        qp = jnp.pad(qp, ((0, 0), (0, n_pad_q - n), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
        kernel = functools.partial(
            _flash_kernel_native,
            d=d, n_valid=n, n_pad=n_pad, fast=fast_softmax,
        )
        out = pl.pallas_call(
            kernel,
            grid=(b, num_heads // 2),
            in_specs=[
                pl.BlockSpec((1, n_pad_q, 2 * d), lambda bi, hp: (bi, 0, hp)),
                pl.BlockSpec((1, n_pad, 2 * d), lambda bi, hp: (bi, 0, hp)),
                pl.BlockSpec((1, n_pad, 2 * d), lambda bi, hp: (bi, 0, hp)),
            ],
            out_specs=pl.BlockSpec((1, n_pad_q, 2 * d), lambda bi, hp: (bi, 0, hp)),
            out_shape=jax.ShapeDtypeStruct((b, n_pad_q, hd), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :n]

    def attn_fwd(q, k, v):
        return attn(q, k, v), (q, k, v)

    def attn_bwd(res, g):
        if bwd_impl in ("auto", "pallas"):
            return _native_bwd_pallas(
                *res, g, scale=scale, n_valid=n_valid, num_heads=num_heads,
                fast=fast_softmax, interpret=interpret,
            )
        # Dense einsum backward on the (B, N, H, D) view (oracle path; the
        # (B, H, N, N) fp32 probabilities/ds are materialized in HBM).
        q, k, v = (x.reshape(b, n, num_heads, d) for x in res)
        g = g.reshape(b, n, num_heads, d)
        f32 = jnp.float32
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=f32)
        s = s * f32(scale)
        p = jax.nn.softmax(s, axis=-1)
        pv = p.astype(v.dtype)
        dv = jnp.einsum("bhqk,bqhd->bkhd", pv, g, preferred_element_type=f32)
        dp = jnp.einsum("bqhd,bkhd->bhqk", g, v, preferred_element_type=f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * f32(scale)).astype(q.dtype)
        dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k, preferred_element_type=f32)
        dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q, preferred_element_type=f32)
        flat = lambda x, dt: x.astype(dt).reshape(b, n, hd)
        return flat(dq, q.dtype), flat(dk, k.dtype), flat(dv, v.dtype)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(q, k, v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "n_valid", "block_q", "block_k", "fast_softmax", "interpret",
    ),
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
    fast_softmax: bool = False,
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
            num_q=num_q, num_k=num_k, fast=fast_softmax, interpret=interpret,
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
    q, k, v, *, scale, n_valid, block_q, block_k, num_q, num_k, fast, interpret,
):
    bh, n_pad_q, d = q.shape
    n_pad = k.shape[1]
    # log2(e) folds into the pre-scale: every kernel variant works in the
    # exp2 domain (``_exp2_poly``), so no per-score-element scaling exists.
    q = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)

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
            _flash_kernel_single, d=d, fast=fast
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
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(q, k, v)

    if fast:
        kernel = functools.partial(_flash_kernel_fast, d=d, num_k=num_k)
        scratch = [pltpu.VMEM((block_q, dv), jnp.float32)]
    else:
        kernel = functools.partial(_flash_kernel, d=d, num_k=num_k)
        scratch = [
            pltpu.VMEM((block_q, dv), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ]
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
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
    fast_softmax: bool = False,
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
        fast_softmax=fast_softmax,
        interpret=interpret,
    )
    return out[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)


def try_spatial_attention(q, k, v, scale, fast_softmax: bool = False):
    """Dispatch gate used by ``ops.attention``: 4-D (B, N, H, D) inputs with
    MXU-friendly head_dim and a sequence long enough to benefit.

    Preferred path: the native-layout kernel (``flash_attention_native``) —
    the (B, N, H, D) → (B, N, H·D) view is a free reshape (axes already
    adjacent), so the whole transpose/pad/augment adaptation layer of the
    (BH, N, D) kernel disappears.  Falls back to the classic kernel for
    long sequences (score row no longer fits one VMEM block) or odd head
    counts."""
    if q.ndim != 4:
        return None
    b, n, h, d = q.shape
    if d % 64 != 0 or d % 128 == 0 or n < 256:
        # d % 128 == 0 would leave no spare lane for the augmented-V row sum
        return None
    if d == 64 and h % 2 == 0 and _round_up(n, 128) <= 2048:
        def merge(x):
            return x.reshape(b, n, h * d)

        out = flash_attention_native(
            merge(q), merge(k), merge(v),
            scale=scale, n_valid=n, num_heads=h, fast_softmax=fast_softmax,
        )
        return out.reshape(b, n, h, d)
    return spatial_flash_attention(q, k, v, scale, fast_softmax=fast_softmax)
