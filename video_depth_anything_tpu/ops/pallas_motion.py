"""Fused whole-motion-module Pallas kernel.

One program computes an ENTIRE ``TemporalModule`` (reference
``motion_module/motion_module.py:32-207``: GroupNorm → proj_in → 2 ×
(LN → APE → q/k/v → per-location frame attention → out proj → residual) →
LN → GEGLU FF → residual → proj_out → outer residual) for one block of
spatial locations, entirely in VMEM.

Why: the XLA whole-module path pays ~5-8 ms per vitl module beyond its
component-sum floor in HBM round-trips and layout moves between GroupNorm,
the projections and the attention core (m0 22.6 ms vs ~17 component sum,
m3 22.2 vs ~16 — docs/PERFORMANCE.md "Temporal-module decomposition").
Fusing the module makes the HBM traffic exactly ``read x + read weights +
write out`` and lets Mosaic pipeline the attention's VPU chain under the
projection/FF GEMMs.

Layout strategy — the kernel is relayout-free:

* The wrapper packs ``P`` consecutive locations into lanes
  (``(B,T,S,C) → (B,T,S/P,P·C)``, a free row-major reshape at the XLA
  level) exactly like ``pallas_temporal.py``.
* Every pointwise/GEMM op is **lane-group-local**: the projections run as
  ``P`` separate lane-sliced GEMMs against the SAME (C, C) weight (same
  total FLOPs as unpacked; slices are 128-aligned because C % 128 == 0),
  LayerNorm statistics reduce per lane group through 0/1 segment-matrix
  GEMMs, and the attention core is the proven packed segment-matrix
  formulation.
* Per-frame quantities (GroupNorm scale/bias folded per (b, t, c), APE
  rows) arrive pre-tiled to the packed lane width.

Supported: any C whose packed lane width is a 128-multiple — covers every
shipped motion width (vitl 1024/256, vitb 768/384/128, vits 384/192/64).
For C not itself a 128-multiple the weights are block-diagonalized to
``gunit = lcm(C,128)/C`` locations per lane group (free at C=64: the MXU
pads 64→128 anyway).  Requires ``num_transformer_blocks == 1`` and APE
positions — the shipped family; other configs keep the XLA/packed-core
paths.

Inference-path kernel; the custom VJP recomputes through the XLA
reference implementation (exact same math, ``motion_module_reference``),
keeping training differentiable.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_depth_anything_tpu.config import MotionModuleConfig
from video_depth_anything_tpu.models.temporal import sinusoidal_position_table

__all__ = ["fused_motion_module", "try_fused_motion_module",
           "motion_module_reference"]

_LANES = 128
_VMEM_BUDGET = 96 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gunit(c: int) -> int:
    """Locations per 128-aligned lane group: lcm(C, 128) / C.  Weights are
    block-diagonalized to this width — free at C=64 (the MXU pads 64→128
    anyway) and a ~1.1× FLOP tax at C=192, vs impossible unaligned lane
    slicing otherwise."""
    import math

    return math.lcm(c, _LANES) // c


def _auto_pack(c: int, heads: int) -> int:
    g = _gunit(c)
    p = max(1, min(_LANES // heads, 1024 // c))
    p -= p % g
    while p > g and (p * c) % _LANES != 0:
        p -= g
    return max(p, 0)


def _segment_matrices(c_grp: int, head_dim: int) -> tuple:
    h_grp = c_grp // head_dim
    seg = np.zeros((c_grp, _LANES), np.float32)
    for h in range(h_grp):
        seg[h * head_dim : (h + 1) * head_dim, h] = 1.0
    return seg, seg.T.copy()


def _ln_matrices(p: int, c: int) -> tuple:
    """(CP, 128) group-sum and (128, CP) group-broadcast 0/1 matrices for
    per-token LayerNorm over each lane group (a packed row holds P
    tokens)."""
    cp = p * c
    seg = np.zeros((cp, _LANES), np.float32)
    for g in range(p):
        seg[g * c : (g + 1) * c, g] = 1.0
    return seg, seg.T.copy()


def _motion_kernel(
    # refs (per grid step)
    x_ref, gna_ref, gnb_ref, pe_ref,
    w_in_ref, b_in_ref, lns_ref, lnb_ref,
    wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    w_out_ref, b_out_ref,
    seg_ref, exp_ref, lnseg_ref, lnexp_ref,
    o_ref,
    # scratch
    y_scr, h_scr, q_scr, k_scr, v_scr, ao_scr, ff_scr, act_scr,
    *,
    t: int, pack: int, c: int, c_grp: int, n_attn: int,
    s_blk: int, ln_eps: float, ff_mult: int, ff_chunk: int,
):
    cp = pack * c
    rows = t * s_blk
    f32 = jnp.float32
    bt = x_ref.dtype

    def ggemm(src_ref, w, dst_ref, bias=None):
        """Per-lane-group GEMM: dst[:, g·N : (g+1)·N] = src[:, g·K:(g+1)·K] @ w
        (+ bias slice).  Weights arrive pre-block-diagonalized to a
        128-multiple lane-group width (``gunit`` locations per group — free
        FLOPs at C=64 where the MXU pads to 128 anyway), so K, N and every
        slice boundary are 128-aligned."""
        kdim, ndim = w.shape
        for g in range(cp // kdim):
            acc = jax.lax.dot_general(
                src_ref[:, g * kdim : (g + 1) * kdim],
                w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            if bias is not None:
                acc = acc + bias[0, g * ndim : (g + 1) * ndim][None, :]
            dst_ref[:, g * ndim : (g + 1) * ndim] = acc.astype(bt)

    def ln_into(src_ref, dst_ref, row_idx, add_pe: bool):
        """dst = LN(src) per lane group (+ APE row per frame)."""
        hf = src_ref[...].astype(f32)
        s1 = jax.lax.dot_general(
            hf, lnseg_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        s2 = jax.lax.dot_general(
            hf * hf, lnseg_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        mean = s1 * (1.0 / c)
        var = jnp.maximum(s2 * (1.0 / c) - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + ln_eps)
        a = jax.lax.dot_general(
            inv, lnexp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        m = jax.lax.dot_general(
            mean * inv, lnexp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        y = (hf * a - m) * lns_ref[row_idx][None, :] + lnb_ref[row_idx][None, :]
        if add_pe:
            y = y.reshape(t, s_blk, cp) + pe_ref[...].astype(f32)[:, None, :]
            y = y.reshape(rows, cp)
        dst_ref[...] = y.astype(bt)

    # -- GroupNorm apply (stats folded outside) + proj_in -------------------
    xb = x_ref[0]  # (T, s_blk, CP)
    y = xb.astype(f32) * gna_ref[0][:, None, :] + gnb_ref[0][:, None, :]
    h_scr[...] = y.reshape(rows, cp).astype(bt)
    ggemm(h_scr, w_in_ref[...], y_scr, bias=b_in_ref)

    # -- attention blocks ---------------------------------------------------
    n_cg = cp // c_grp
    for i in range(n_attn):
        ln_into(y_scr, h_scr, i, add_pe=True)
        ggemm(h_scr, wq_ref[i], q_scr)  # wq pre-scaled by d^-0.5
        ggemm(h_scr, wk_ref[i], k_scr)
        ggemm(h_scr, wv_ref[i], v_scr)

        for gg in range(n_cg):
            lo = gg * c_grp
            k3 = k_scr[:, lo : lo + c_grp].reshape(t, s_blk, c_grp)
            v3 = v_scr[:, lo : lo + c_grp].reshape(t, s_blk, c_grp)

            def per_t1(t1, _):
                qt = q_scr[pl.ds(t1 * s_blk, s_blk), lo : lo + c_grp]
                e = qt[None] * k3  # (T, s_blk, c_grp) bf16 VPU
                scores = jax.lax.dot_general(
                    e.reshape(rows, c_grp), seg_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).reshape(t, s_blk, _LANES)
                m = jnp.max(scores, axis=0, keepdims=True)
                p_ = jnp.exp(scores - m)
                l_ = jnp.sum(p_, axis=0, keepdims=True)
                p_ = (p_ / l_).astype(bt)
                p_full = jax.lax.dot_general(
                    p_.reshape(rows, _LANES), exp_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).astype(bt).reshape(t, s_blk, c_grp)
                o = jnp.sum((p_full * v3).astype(f32), axis=0)
                ao_scr[pl.ds(t1 * s_blk, s_blk), lo : lo + c_grp] = o.astype(bt)
                return 0

            jax.lax.fori_loop(0, t, per_t1, 0)

        # out projection + residual into y
        ggemm(ao_scr, wo_ref[i], h_scr, bias=None)
        y_scr[...] = (
            y_scr[...].astype(f32)
            + h_scr[...].astype(f32)
            + bo_ref[i][None, :]
        ).astype(bt)

    # -- GEGLU feed-forward (row-chunked: the 2·ff·C-wide inner activations
    # only ever exist for ``ff_chunk`` rows at a time) ----------------------
    ln_into(y_scr, h_scr, n_attn, add_pe=False)
    inner = ff_mult * c
    k1_, n1_ = w1_ref.shape  # (gunit·C, gunit·2·inner)
    k2_, n2_ = w2_ref.shape  # (gunit·inner, gunit·C)
    for r0 in range(0, rows, ff_chunk):
        rsl = slice(r0, r0 + ff_chunk)
        for g in range(cp // k1_):
            acc = jax.lax.dot_general(
                h_scr[rsl, g * k1_ : (g + 1) * k1_],
                w1_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + b1_ref[0, g * n1_ : (g + 1) * n1_][None, :]
            ff_scr[:, g * n1_ : (g + 1) * n1_] = acc.astype(bt)
        for g in range(pack):  # h/gate split is per location (2·inner wide)
            hh = ff_scr[:, g * 2 * inner : g * 2 * inner + inner]
            gate = ff_scr[:, g * 2 * inner + inner : (g + 1) * 2 * inner]
            # GELU flavor by dtype, matching the XLA reference math and the
            # VJP recompute (motion_module_reference, line ~343): tanh
            # approximation in bf16, exact erf in fp32 — so fused fp32
            # forwards agree with their own backward pass (advisor r3).
            act_scr[:, g * inner : (g + 1) * inner] = hh * jax.nn.gelu(
                gate, approximate=bt == jnp.bfloat16
            )
        for g in range(pack * inner // k2_):
            acc = jax.lax.dot_general(
                act_scr[:, g * k2_ : (g + 1) * k2_],
                w2_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + b2_ref[0, g * n2_ : (g + 1) * n2_][None, :]
            y_scr[rsl, g * n2_ : (g + 1) * n2_] = (
                y_scr[rsl, g * n2_ : (g + 1) * n2_].astype(f32) + acc
            ).astype(bt)

    # -- proj_out + outer residual ------------------------------------------
    ggemm(y_scr, w_out_ref[...], h_scr, bias=b_out_ref)
    o_ref[0] = (
        h_scr[...].astype(f32).reshape(t, s_blk, cp) + xb.astype(f32)
    ).astype(o_ref.dtype)


def _plan_s_blk(t: int, pack: int, c: int, weight_bytes: int,
                ff_mult: int, c_grp: int) -> tuple:
    """Largest packed s_blk whose scratch fits VMEM; returns
    (s_blk, ff_chunk)."""
    cp = pack * c
    for s_blk in (256, 192, 128, 96, 64, 48, 32, 16, 8):
        rows = t * s_blk
        ff_chunk = rows
        while ff_chunk > 256 and ff_chunk % 2 == 0:
            ff_chunk //= 2
        est = (
            2 * (t * s_blk * cp * 2) * 2      # x + out, double-buffered
            + 6 * rows * cp * 2               # y/h/q/k/v/ao scratch
            + ff_chunk * (3 * ff_mult * c * pack) * 2  # ff + act scratch
            + rows * _LANES * 4 * 2           # score tile (+ softmax temp)
            + rows * c_grp * (2 + 2 + 4)      # e / p_full / o temporaries
            + weight_bytes
        )
        if est <= _VMEM_BUDGET:
            return s_blk, ff_chunk
    return None, None


def motion_module_reference(x: jnp.ndarray, p: Dict, cfg: MotionModuleConfig,
                            heads: int):
    """XLA reference of the whole module from raw param arrays (same math
    as ``models.temporal.TemporalModule``); used as the fused kernel's VJP
    recompute path and as the parity oracle in tests."""
    b, t, s, c = x.shape
    f32 = jnp.float32
    g = cfg.norm_num_groups

    xf = x.astype(f32)
    # GroupNorm: stats over (spatial, intra-group channels) per (b, t, group)
    grouped = xf.reshape(b, t, s, g, c // g)
    mean = grouped.mean(axis=(2, 4), keepdims=True)
    var = grouped.var(axis=(2, 4), keepdims=True)
    grouped = (grouped - mean) * jax.lax.rsqrt(var + cfg.group_norm_eps)
    y = (grouped.reshape(b, t, s, c) * p["gn_scale"] + p["gn_bias"]).astype(
        x.dtype
    )

    y = y @ p["w_in"].astype(x.dtype) + p["b_in"].astype(x.dtype)
    d = c // heads
    scale = jnp.float32(d**-0.5)
    pe = jnp.asarray(
        sinusoidal_position_table(cfg.temporal_max_len, c)[:t], x.dtype
    )

    def ln(h, sc, bi):
        hf = h.astype(f32)
        mean = hf.mean(axis=-1, keepdims=True)
        var = jnp.maximum(
            (hf * hf).mean(axis=-1, keepdims=True) - mean * mean, 0.0
        )
        return (
            (hf - mean) * (jax.lax.rsqrt(var + cfg.layer_norm_eps) * sc) + bi
        ).astype(h.dtype)

    for i in range(cfg.num_attention_blocks):
        h = ln(y, p["ln_scale"][i], p["ln_bias"][i])
        hp = h + pe[None, :, None, :]
        q = hp @ p["wq"][i].astype(x.dtype)
        k = hp @ p["wk"][i].astype(x.dtype)
        v = hp @ p["wv"][i].astype(x.dtype)
        q5 = q.reshape(b, t, s, heads, d)
        k5 = k.reshape(b, t, s, heads, d)
        v5 = v.reshape(b, t, s, heads, d)
        scores = jnp.einsum(
            "bqshd,bkshd->bshqk", q5, k5, preferred_element_type=f32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bshqk,bkshd->bqshd", probs, v5, preferred_element_type=f32
        ).astype(x.dtype).reshape(b, t, s, c)
        y = y + out @ p["wo"][i].astype(x.dtype) + p["bo"][i].astype(x.dtype)

    h = ln(y, p["ln_scale"][-1], p["ln_bias"][-1])
    hh = h @ p["w1"].astype(x.dtype) + p["b1"].astype(x.dtype)
    hh, gate = jnp.split(hh, 2, axis=-1)
    hh = hh * jax.nn.gelu(gate, approximate=x.dtype == jnp.bfloat16)
    y = y + hh @ p["w2"].astype(x.dtype) + p["b2"].astype(x.dtype)

    y = y @ p["w_out"].astype(x.dtype) + p["b_out"].astype(x.dtype)
    return y + x


def _gn_fold(x, p, cfg: MotionModuleConfig, pack: int):
    """Per-(b, t, c) GroupNorm scale/bias folded with the affine params
    (one cheap XLA pass over x), pre-tiled to the packed lane width."""
    b, t, s, c = x.shape
    g = cfg.norm_num_groups
    f32 = jnp.float32
    xf = x.astype(f32).reshape(b, t, s, g, c // g)
    mean = xf.mean(axis=(2, 4))  # (b, t, g)
    var = xf.var(axis=(2, 4))
    inv = jax.lax.rsqrt(var + cfg.group_norm_eps)
    inv_c = jnp.repeat(inv, c // g, axis=-1)  # (b, t, c)
    mean_c = jnp.repeat(mean, c // g, axis=-1)
    a = inv_c * p["gn_scale"].astype(f32)
    bia = p["gn_bias"].astype(f32) - mean_c * a
    return jnp.tile(a, (1, 1, pack)), jnp.tile(bia, (1, 1, pack))


@functools.partial(
    jax.jit,
    static_argnames=("heads", "cfg", "interpret", "c_grp_override"),
)
def fused_motion_module(
    x: jnp.ndarray,
    params: Dict,
    *,
    heads: int,
    cfg: MotionModuleConfig,
    interpret: bool = False,
    c_grp_override: int = 0,
):
    """``x (B, T, S, C)`` → whole motion module output, fused.

    ``params``: raw arrays — gn_scale/gn_bias (c,), w_in/b_in, per-block
    stacked wq/wk/wv/wo (n, C, C) + bo (n, C), ln_scale/ln_bias
    (n+1, C), w1 (C, 2·ff·C), b1, w2 (ff·C, C), b2, w_out/b_out.
    Differentiable (VJP recomputes through ``motion_module_reference``)."""

    def fwd(x, params):
        return _forward(x, params, heads, cfg, interpret, c_grp_override)

    @jax.custom_vjp
    def op(x, params):
        return fwd(x, params)

    def op_fwd(x, params):
        return fwd(x, params), (x, params)

    def op_bwd(res, g):
        x, params = res
        _, vjp = jax.vjp(
            lambda xx, pp: motion_module_reference(xx, pp, cfg, heads),
            x, params,
        )
        return vjp(g)

    op.defvjp(op_fwd, op_bwd)
    return op(x, params)


def _blockdiag(w, gunit: int):
    """(K, N) → (gunit·K, gunit·N) block-diagonal (per-location groups)."""
    if gunit == 1:
        return w
    k, n = w.shape
    out = jnp.zeros((gunit * k, gunit * n), w.dtype)
    for j in range(gunit):
        out = out.at[j * k : (j + 1) * k, j * n : (j + 1) * n].set(w)
    return out


def _forward(x, params, heads, cfg, interpret, c_grp_override):
    b, t, s, c = x.shape
    d = c // heads
    pack = _auto_pack(c, heads)
    gunit = _gunit(c)
    cp = pack * c
    c_grp = c_grp_override or (256 if d == 128 else cp)
    bt = x.dtype
    f32 = jnp.float32
    n_attn = cfg.num_attention_blocks
    ff_mult = cfg.ff_mult

    weight_bytes = (
        (2 + 4 * n_attn) * c * c * 2 * gunit * gunit
        + 3 * ff_mult * c * c * 2 * gunit * gunit
        + (c_grp * _LANES * 2) * 2
        + (cp * _LANES * 4) * 2
    )
    s_blk, ff_chunk = _plan_s_blk(t, pack, c, weight_bytes, ff_mult, c_grp)
    assert s_blk is not None, "gate should have rejected this shape"

    gna, gnb = _gn_fold(x, params, cfg, pack)

    # pack locations into lanes (free reshape) and pad S
    s_packed = _round_up(s, pack * s_blk)
    if s_packed != s:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s_packed - s), (0, 0)))
    xp = x.reshape(b, t, s_packed // pack, cp)
    sp = s_packed // pack

    pe = jnp.tile(
        jnp.asarray(sinusoidal_position_table(cfg.temporal_max_len, c)[:t], bt),
        (1, pack),
    )
    scale = jnp.float32(d**-0.5)
    wq = (params["wq"].astype(f32) * scale).astype(bt)

    def bd(w):
        return _blockdiag(w.astype(bt), gunit)

    def bd_stack(ws):
        return jnp.stack([_blockdiag(ws[i].astype(bt), gunit)
                          for i in range(n_attn)])

    seg, expand = _segment_matrices(c_grp, d)
    lnseg, lnexp = _ln_matrices(pack, c)

    def tile_bias(v):  # (..., C) -> (1, P·C) fp32 rows
        v = v.astype(f32)
        return jnp.tile(v.reshape(1, -1), (1, pack))

    kernel = functools.partial(
        _motion_kernel,
        t=t, pack=pack, c=c, c_grp=c_grp, n_attn=n_attn,
        s_blk=s_blk, ln_eps=cfg.layer_norm_eps, ff_mult=ff_mult,
        ff_chunk=ff_chunk,
    )
    rows = t * s_blk
    inner = ff_mult * c

    blk = pl.BlockSpec((1, t, s_blk, cp), lambda bi, si: (bi, 0, si, 0))
    row_full = lambda shape: pl.BlockSpec(shape, lambda bi, si: tuple([0] * len(shape)))  # noqa: E731
    gn_spec = pl.BlockSpec((1, t, cp), lambda bi, si: (bi, 0, 0))

    out = pl.pallas_call(
        kernel,
        grid=(b, sp // s_blk),
        in_specs=[
            blk,                                   # x
            gn_spec, gn_spec,                      # gn a/b
            row_full((t, cp)),                     # pe
            row_full((gunit * c, gunit * c)),      # w_in
            row_full((1, cp)),                     # b_in
            row_full((n_attn + 1, cp)),            # ln_scale
            row_full((n_attn + 1, cp)),            # ln_bias
            row_full((n_attn, gunit * c, gunit * c)),  # wq
            row_full((n_attn, gunit * c, gunit * c)),  # wk
            row_full((n_attn, gunit * c, gunit * c)),  # wv
            row_full((n_attn, gunit * c, gunit * c)),  # wo
            row_full((n_attn, cp)),                # bo
            row_full((gunit * c, gunit * 2 * inner)),  # w1
            row_full((1, 2 * inner * pack)),       # b1
            row_full((gunit * inner, gunit * c)),  # w2
            row_full((1, cp)),                     # b2
            row_full((gunit * c, gunit * c)),      # w_out
            row_full((1, cp)),                     # b_out
            row_full((c_grp, _LANES)),             # seg
            row_full((_LANES, c_grp)),             # expand
            row_full((cp, _LANES)),                # lnseg
            row_full((_LANES, cp)),                # lnexp
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(xp.shape, bt),
        scratch_shapes=[
            pltpu.VMEM((rows, cp), bt),            # y
            pltpu.VMEM((rows, cp), bt),            # h
            pltpu.VMEM((rows, cp), bt),            # q
            pltpu.VMEM((rows, cp), bt),            # k
            pltpu.VMEM((rows, cp), bt),            # v
            pltpu.VMEM((rows, cp), bt),            # attn out
            pltpu.VMEM((ff_chunk, 2 * inner * pack), bt),  # ff inner
            pltpu.VMEM((ff_chunk, inner * pack), bt),      # ff act
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        xp, gna, gnb, pe,
        bd(params["w_in"]), tile_bias(params["b_in"]),
        jnp.tile(params["ln_scale"].astype(f32), (1, pack)),
        jnp.tile(params["ln_bias"].astype(f32), (1, pack)),
        bd_stack(wq), bd_stack(params["wk"]), bd_stack(params["wv"]),
        bd_stack(params["wo"]),
        jnp.tile(params["bo"].astype(f32), (1, pack)),
        bd(params["w1"]),
        _tile_b1(params["b1"], pack, inner),
        bd(params["w2"]), tile_bias(params["b2"]),
        bd(params["w_out"]), tile_bias(params["b_out"]),
        jnp.asarray(seg, bt), jnp.asarray(expand, bt),
        jnp.asarray(lnseg), jnp.asarray(lnexp),
    )

    out = out.reshape(b, t, s_packed, c)
    if s_packed != s:
        out = out[:, :, :s]
    return out


def _tile_b1(b1, pack: int, inner: int):
    """b1 is (2·inner,) = [h | gate]; packed groups each need the full
    [h | gate] pair: tile whole."""
    return jnp.tile(b1.astype(jnp.float32).reshape(1, -1), (1, pack))


def try_fused_motion_module(x, params, *, heads: int, cfg: MotionModuleConfig,
                            interpret: bool = False):
    """Dispatch gate.  Covers C % 128 == 0, single-transformer-block APE
    modules (the shipped family) on TPU; returns None → caller runs the
    XLA/packed-core path."""
    if x.ndim != 4 or cfg.num_transformer_blocks != 1:
        return None
    if cfg.pos_embedding_type != "ape":
        return None
    b, t, s, c = x.shape
    if c % heads or t < 8:
        return None
    d = c // heads
    pack = _auto_pack(c, heads)
    gunit = _gunit(c)
    if pack < gunit or (pack * c) % _LANES or pack % gunit:
        return None
    n_attn = cfg.num_attention_blocks
    weight_bytes = (
        (2 + 4 * n_attn) * c * c * 2 * gunit * gunit
        + 3 * cfg.ff_mult * c * c * 2 * gunit * gunit
        + 2 * (256 if d == 128 else pack * c) * _LANES * 2
        + 2 * pack * c * _LANES * 4
    )
    c_grp = 256 if d == 128 else pack * c
    if _plan_s_blk(t, pack, c, weight_bytes, cfg.ff_mult, c_grp)[0] is None:
        return None
    if not interpret:
        from video_depth_anything_tpu.ops.flash_attention import _on_tpu

        if not _on_tpu():
            return None
    return fused_motion_module(
        x, params, heads=heads, cfg=cfg, interpret=interpret
    )
