"""Pallas TPU kernel for the temporal ("motion") attention core.

The motion modules attend along the 32-frame axis independently per spatial
location (reference rearrange ``(b f) d c -> (b d) f c``,
``video_depth_anything/motion_module/motion_module.py:253``): batch = B·S·H
tiny (T=32, d∈{32,128}) attentions.  XLA lowers the batched einsum to loops
of sub-MXU-tile GEMMs plus layout copies — measured ~3× above the GEMM
floor at the vitl shapes (docs/PERFORMANCE.md).

TPU-native formulation: keep the natural ``(B, T, S, C)`` layout (C on
lanes, S on sublanes — no transposes at all) and compute, per query frame
``t1``:

  * ``E = q[t1] * K``                 — elementwise over (T2, S_blk, C), VPU
  * per-head reduce of E over d lanes — either one MXU GEMM with a 0/1
    segment matrix ``(C_grp, 128)`` (contraction is the full lane axis), or
    a VPU lane-tree ``reshape(T2, S_blk, H, d).sum(-1)``
  * fp32 softmax over the frame axis (axis 0 — plain tile ops, no
    cross-lane work)
  * head→lane expand of the probabilities (transposed segment matrix on the
    MXU, or a broadcast+reshape on the VPU) and a ``Σ_t2 p·V`` fused
    multiply-reduce.

Channel groups of ≤256 lanes (whole heads) bound VMEM, so the grid is
``(B, S-blocks, C-groups)`` and every program is independent ("parallel"
semantics; no carried state).  Pad spatial locations compute garbage that
the wrapper slices off — softmax is over the always-full frame axis, so no
masking is needed anywhere.  Unused segment-matrix lanes produce score 0 →
exp ≤ 1 → finite probabilities that the zero columns of the expand matrix
annihilate: no NaN path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["temporal_attention_window", "try_temporal_attention"]

_LANES = 128


def _segment_matrices(c_grp: int, head_dim: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """(seg, expand): seg (c_grp, 128) sums each head's d lanes into one
    score lane; expand (128, c_grp) broadcasts a head's probability back
    over its d lanes."""
    h_grp = c_grp // head_dim
    seg = np.zeros((c_grp, _LANES), dtype=dtype)
    for h in range(h_grp):
        seg[h * head_dim : (h + 1) * head_dim, h] = 1.0
    return seg, seg.T.copy()


def _temporal_kernel(
    q_ref,
    k_ref,
    v_ref,
    seg_ref,
    exp_ref,
    o_ref,
    *,
    t: int,
    head_dim: int,
    reduce_impl: str,
):
    k_ = k_ref[0]
    v_ = v_ref[0]
    t_, s_blk, c_grp = k_.shape
    h_grp = c_grp // head_dim

    def per_t1(t1, _):
        qt = q_ref[0, pl.ds(t1, 1)]  # (1, S_blk, C_grp), pre-scaled
        e = qt * k_  # (T2, S_blk, C_grp) bf16 on the VPU
        if reduce_impl == "mxu":
            scores = jax.lax.dot_general(
                e.reshape(t_ * s_blk, c_grp),
                seg_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(t_, s_blk, _LANES)
        else:
            scores = jnp.sum(
                e.reshape(t_, s_blk, h_grp, head_dim).astype(jnp.float32), axis=-1
            )
        # softmax over the frame axis (axis 0): outer-dim reductions only.
        m = jnp.max(scores, axis=0, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        p = (p / l).astype(v_.dtype)
        if reduce_impl == "mxu":
            p_full = jax.lax.dot_general(
                p.reshape(t_ * s_blk, _LANES),
                exp_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(v_.dtype).reshape(t_, s_blk, c_grp)
        else:
            p_full = jnp.broadcast_to(
                p[:, :, :, None], (t_, s_blk, h_grp, head_dim)
            ).reshape(t_, s_blk, c_grp)
        o = jnp.sum((p_full * v_).astype(jnp.float32), axis=0)
        o_ref[0, t1] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t, per_t1, 0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _attention_bwd_math(q, k, v, g, heads: int, scale: float):
    """XLA einsum backward for per-location frame attention (used as the
    custom VJP of the Pallas forward: at T=32 the dense recompute is cheap
    and keeps training differentiable through the kernel)."""
    b, t, s, c = q.shape
    d = c // heads
    f32 = jnp.float32
    q5 = q.reshape(b, t, s, heads, d)
    k5 = k.reshape(b, t, s, heads, d)
    v5 = v.reshape(b, t, s, heads, d)
    g5 = g.reshape(b, t, s, heads, d)
    scores = jnp.einsum(
        "bqshd,bkshd->bshqk", q5, k5, preferred_element_type=f32
    ) * f32(scale)
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bshqk,bqshd->bkshd", p.astype(g.dtype), g5,
                    preferred_element_type=f32).astype(v.dtype)
    dp = jnp.einsum("bqshd,bkshd->bshqk", g5, v5, preferred_element_type=f32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * f32(scale)).astype(q.dtype)
    dq = jnp.einsum("bshqk,bkshd->bqshd", ds, k5,
                    preferred_element_type=f32).astype(q.dtype)
    dk = jnp.einsum("bshqk,bqshd->bkshd", ds, q5,
                    preferred_element_type=f32).astype(k.dtype)
    return (
        dq.reshape(b, t, s, c),
        dk.reshape(b, t, s, c),
        dv.reshape(b, t, s, c),
    )


def _auto_pack(c: int, heads: int) -> int:
    """Spatial-location lane packing factor.

    ``(B, T, S, C) → (B, T, S/P, P·C)`` is a free row-major reshape; with it
    the segment GEMM contracts over ``P·C`` lanes (full MXU passes instead
    of a ≤C-wide contraction) and the fp32 softmax tile shrinks P× (score
    lanes go from ``heads`` real out of 128 to ``P·heads``).  Pick the
    largest P with (a) at most 128 score lanes, (b) a 128-aligned packed
    lane count ≤ 1024 (VMEM: tiles are ``(T, rows, P·C)``).
    """
    p = max(1, min(_LANES // heads, 1024 // c))
    while p > 1 and (p * c) % _LANES != 0:
        p -= 1
    return p


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "scale", "block_s", "reduce_impl", "pack_locs", "interpret"
    ),
)
def temporal_attention_window(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    heads: int,
    scale: float,
    block_s: int = 0,
    reduce_impl: str = "mxu",
    pack_locs: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-location attention over the frame axis.

    ``q, k, v: (B, T, S, C)`` → ``(B, T, S, C)``; softmax over the T (key)
    axis independently for each (location, head).  Matches
    ``TemporalSelfAttention._attend`` within bf16 tolerance; differentiable
    (Pallas forward, einsum backward).

    ``pack_locs``: number of consecutive spatial locations folded into the
    lane axis (0 → auto).  Packing is exact — every op in the kernel is
    per-(location, head) lane-local, and the segment matrices built for the
    packed ``c_grp = P·C`` are precisely the block-diagonal over locations.
    """
    b, t, s, c = q.shape
    head_dim = c // heads
    s_orig, c_orig = s, c
    pack = pack_locs if pack_locs else _auto_pack(c, heads)
    if pack > 1:
        s_packed = _round_up(s, pack)
        if s_packed != s:
            pad = [(0, 0), (0, 0), (0, s_packed - s), (0, 0)]
            q = jnp.pad(q, pad)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        q = q.reshape(b, t, s_packed // pack, pack * c)
        k = k.reshape(b, t, s_packed // pack, pack * c)
        v = v.reshape(b, t, s_packed // pack, pack * c)
        s, c = s_packed // pack, pack * c
    c_grp = min(c, 1024 if pack > 1 else 256)
    h_grp = c_grp // head_dim
    if block_s == 0:
        # Byte-aware block sizing: q/k/v/out blocks are double-buffered by
        # the pipeline (8 block-sized VMEM buffers) plus in-kernel fp32
        # score/probability temporaries — ~1 MB per input block keeps the
        # whole program inside the 16 MB VMEM budget for bf16 and fp32.
        itemsize = jnp.dtype(q.dtype).itemsize
        block_s = max(16, (1 << 20) // (t * c_grp * itemsize) // 16 * 16)
    s_pad = _round_up(s, block_s)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    def forward(q, k, v):
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        seg, expand = _segment_matrices(c_grp, head_dim, np.float32)
        seg = jnp.asarray(seg, dtype=q.dtype)
        expand = jnp.asarray(expand, dtype=q.dtype)

        kernel = functools.partial(
            _temporal_kernel, t=t, head_dim=head_dim, reduce_impl=reduce_impl
        )
        grid = (b, s_pad // block_s, c // c_grp)
        qkv_spec = pl.BlockSpec(
            (1, t, block_s, c_grp), lambda bi, si, ci: (bi, 0, si, ci)
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                qkv_spec,
                qkv_spec,
                qkv_spec,
                pl.BlockSpec((c_grp, _LANES), lambda bi, si, ci: (0, 0)),
                pl.BlockSpec((_LANES, c_grp), lambda bi, si, ci: (0, 0)),
            ],
            out_specs=qkv_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
            ),
            interpret=interpret,
        )(qs, k, v, seg, expand)

    @jax.custom_vjp
    def attn(q, k, v):
        return forward(q, k, v)

    def attn_fwd(q, k, v):
        return forward(q, k, v), (q, k, v)

    def attn_bwd(res, g):
        # On the packed operands each (location, head) pair is one head of
        # the same head_dim — the dense backward is exact with heads·pack.
        return _attention_bwd_math(*res, g, heads=heads * pack, scale=scale)

    attn.defvjp(attn_fwd, attn_bwd)
    out = attn(q, k, v)
    if s_pad != s:
        out = out[:, :, :s]
    if pack > 1:
        out = out.reshape(b, t, s * pack, c_orig)[:, :, :s_orig]
    return out


def try_temporal_attention(q, k, v, *, heads: int, scale: float, auto: bool = False):
    """Dispatch gate: (B, T, S, C) bf16/f32 with lane-aligned head groups.

    Covers every vits/vitl motion-module shape (C ∈ {64, 192, 256, 384,
    1024}, d ∈ {8, 24, 32, 48, 128}); returns ``None`` (→ XLA einsum path)
    for unsupported layouts.  With ``auto=True`` the gate dispatches to the
    kernel exactly where it measured faster than XLA's bf16 batched einsum
    on v5e (docs/PERFORMANCE.md): every head_dim ≤ 64 shape, with location
    packing — vits m3 64@74²: 3.4 vs 9.3 ms, vitl m3 256@74²: 9.0 vs
    13.8 ms — while at head_dim 128 XLA's wide batched GEMMs win ~3×.
    """
    if q.ndim != 4:
        return None
    b, t, s, c = q.shape
    head_dim = c // heads
    if c % heads != 0 or t < 8:
        return None
    pack = _auto_pack(c, heads)
    if (pack * c) % _LANES != 0:
        return None
    if pack == 1 and (c % _LANES != 0 or head_dim not in (32, 64, 128)):
        return None
    if auto and head_dim > 24:
        # Round-2 module-level A/B (scripts/bench_temporal.py --variants
        # module, docs/PERFORMANCE.md): when XLA sees the whole
        # proj→attend graph it beats the kernel for every head_dim ≥ 32
        # shape (vitl m2/m3 256@d32: 4.96/22.2 vs 6.04/24.1 ms; vits m1
        # 384@d48: 2.48 vs 3.32) — the kernel's elementwise formulation
        # only pays off when tiny heads would leave XLA's score GEMMs
        # lane-starved (vits m0/m2/m3, d ≤ 24: up to 18.9 → 6.8 ms).
        return None
    try:
        if jax.devices()[0].platform != "tpu":
            return None
    except Exception:  # pragma: no cover
        return None
    return temporal_attention_window(q, k, v, heads=heads, scale=scale)
