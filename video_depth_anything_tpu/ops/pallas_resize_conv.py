"""Fused Pallas kernel: bilinear 2× upsample → 3×3 conv (+bias).

**Measured-and-rejected as a model integration** (v5e, docs/PERFORMANCE.md):
at the vitl refinenet1 → ``output_conv1`` junction (resize 148→296 @256ch +
conv3×3 256→128 @296², reference ``util/blocks.py:156-161`` →
``dpt.py:114-116``) the kernel measures 21.6 ms vs 18.4 ms for the XLA
pair — unlike the output tail, XLA already schedules this stretch well
(the 1×1/conv GEMMs fold around the resize einsums), so the VMEM-locality
win doesn't materialize.  Kept as a standalone, tested, differentiable op
and as the record of the experiment; the model keeps the XLA path
(``models/dpt.py FeatureFusionBlock``).

Design (same machinery as ``ops/pallas_output_stack.py``): run
[resize → conv] per (frame, row-block) in VMEM and write only the conv
output — input read once (bf16), output written once (bf16), nothing else
touches HBM.

Numerics: identical interpolation taps/fp32 arithmetic as ``ops.resize``
(horizontal pass first — the separable passes commute), hi+lo-split bf16
GEMMs for the interpolation matrices (≤ ~1e-7 rel err vs fp32), fp32 conv
accumulation with the bf16 rounding points of the XLA chain.  The wrapper
returns ``None`` when the kernel does not cover the shape and the caller
falls back to the XLA [``ops.resize.bilinear_resize`` → conv] pair.

Differentiable: the custom VJP recomputes the backward through the XLA
reference chain (same pattern as the fused output tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_depth_anything_tpu.ops.pallas_output_stack import (
    _CHUNK,
    _block_tables,
    _horizontal_chunks,
    _round_up,
    _split_hi_lo,
    _vertical_tables,
)
from video_depth_anything_tpu.ops.resize import bilinear_resize

__all__ = ["try_fused_resize_conv", "fused_resize_conv", "xla_resize_conv"]

_VMEM_BUDGET = 97 * 1024 * 1024


def _pick_row_block(out_h: int, top: int) -> int:
    best = None
    for r in range(top, 31, -8):
        hr = -(-out_h // r) * r
        if best is None or hr < best[0] or (hr == best[0] and r > best[1]):
            best = (hr, r)
    return best[1]


def _resize_conv_kernel(
    # scalar prefetch
    us_ref,  # (nb,) int32 — first input row held in h2 per row-block
    lo_ref,  # (out_h,) int32
    hi_ref,  # (out_h,) int32
    w0_ref,  # (out_h,) fp32
    w1_ref,  # (out_h,) fp32
    # operands
    x_ref,  # (N, H, W, C) bf16 — stays in HBM; rows DMA'd per block
    whl_ref,  # (nchunks, 2·CHUNK, K) bf16 — hi/lo interpolation weights
    k_ref,  # (9, C, Cout) bf16 — conv taps
    b_ref,  # (1, Cout) fp32
    o_ref,  # (1, R, Ws, Cout) bf16
    # scratch
    xbuf_ref,  # (U, W, C) bf16
    rowb_ref,  # (RG, W, C) bf16
    h2_ref,  # (U, W2, C) fp32
    r2_ref,  # (R+2, W2, C) bf16 — resized rows + conv halo
    r2s1_ref,  # (R+2, Ws, C) bf16 — shifted left by 1 column
    r2s2_ref,  # (R+2, Ws, C) bf16 — shifted left by 2 columns
    dma_sem,
    *,
    out_h,
    r_blk,
    r_sub,
    u_rows,
    row_group,
    chunk_starts,
    k_span,
    ws,
):
    ni = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * r_blk
    us = us_ref[rb]

    cp = pltpu.make_async_copy(
        x_ref.at[ni, pl.ds(us, u_rows)], xbuf_ref, dma_sem
    )
    cp.start()
    cp.wait()

    h2_ref[...] = jnp.zeros(h2_ref.shape, h2_ref.dtype)

    # -- 1. horizontal resize (banded hi/lo-split GEMMs, rows in lanes) -----
    rg = row_group
    c = xbuf_ref.shape[-1]

    def hrow(jj, carry):
        j0 = jj * rg
        rowb_ref[...] = xbuf_ref[pl.ds(j0, rg)]
        for ci, (o0, s) in enumerate(chunk_starts):
            seg = jnp.concatenate(
                [rowb_ref[r, s : s + k_span] for r in range(rg)], axis=-1
            )
            yhl = jax.lax.dot_general(
                whl_ref[ci], seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for r in range(rg):
                y = yhl[:_CHUNK, r * c : (r + 1) * c] + yhl[
                    _CHUNK:, r * c : (r + 1) * c
                ]
                h2_ref[pl.ds(j0 + r, 1), 1 + o0 : 1 + o0 + _CHUNK] = y[None]
        return carry

    jax.lax.fori_loop(0, u_rows // rg, hrow, 0)

    # -- 2. vertical resize into the conv tile (halo rows zero) -------------
    # Statically unrolled — see the identical note in pallas_output_stack.
    for i in range(r_blk + 2):
        o = r0 - 1 + i
        oc = jnp.clip(o, 0, out_h - 1)
        a = h2_ref[pl.ds(lo_ref[oc] - us, 1)]
        b = h2_ref[pl.ds(hi_ref[oc] - us, 1)]
        rowv = a * w0_ref[oc] + b * w1_ref[oc]
        valid = jnp.logical_and(o >= 0, o < out_h)
        rowv = jnp.where(valid, rowv, 0.0)
        r2_ref[pl.ds(i, 1)] = rowv.astype(r2_ref.dtype)

    # -- 3. conv3×3 + bias, in row sub-blocks --------------------------------
    r2s1_ref[...] = r2_ref[:, 1 : 1 + ws, :]
    r2s2_ref[...] = r2_ref[:, 2 : 2 + ws, :]
    shifted = (None, r2s1_ref, r2s2_ref)
    cout = o_ref.shape[-1]
    for ri in range(0, r_blk, r_sub):
        rs = min(r_sub, r_blk - ri)
        acc = None
        for dy in range(3):
            for dx in range(3):
                ref = shifted[dx]
                if ref is None:
                    src = r2_ref[ri + dy : ri + dy + rs, 0:ws, :]
                else:
                    src = ref[ri + dy : ri + dy + rs, :, :]
                y = jax.lax.dot_general(
                    src.reshape(rs * ws, c), k_ref[dy * 3 + dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
        z = acc.astype(jnp.bfloat16) + b_ref[...].astype(jnp.bfloat16)
        o_ref[0, ri : ri + rs] = z.reshape(rs, ws, cout)


def xla_resize_conv(x, k, b, out_h: int, out_w: int):
    """Reference XLA chain (numerics oracle + custom-VJP backward):
    bilinear align_corners=True resize → conv3×3 (padding 1) + bias."""
    y = bilinear_resize(x, out_h, out_w)
    y = jax.lax.conv_general_dilated(
        y, k.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(y.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_resize_conv(x, k, b, out_h, out_w, interpret=False):
    return _forward(x, k, b, out_h, out_w, interpret)


def _row_block(out_h: int, out_w: int, in_h: int, w: int, c: int, cout: int):
    """Largest row block whose scratch fits the VMEM budget."""
    for top in (104, 72, 48, 40, 32):
        r_blk = _pick_row_block(out_h, top)
        r_sub = r_blk if r_blk <= 24 else -(-r_blk // 4)
        _, span = _block_tables(in_h, out_h, r_blk)
        # rows per horizontal GEMM: lane-concatenate rows until the rhs N
        # dimension reaches 512 lanes (same fill rule as the tail kernel's
        # rg=4 at C=128 — a lone C=256 row leaves the MXU half idle and
        # doubles the per-dot dispatch count)
        rg = max(1, 512 // c) if span >= max(1, 512 // c) else 1
        u4 = _round_up(span, rg)
        ws = _round_up(out_w + 2, 8)
        w2 = _round_up(max(ws + 8, 1 + max(out_w, _CHUNK)), 8)
        w8 = _round_up(w, 8)
        est = (
            u4 * w8 * c * 2          # xbuf
            + rg * w8 * c * 2        # rowb
            + u4 * w2 * c * 4        # h2 fp32
            + (r_blk + 2) * w2 * c * 2
            + 2 * (r_blk + 2) * ws * c * 2
            + r_sub * ws * (c * 2 + max(cout, 128) * 4) * 3
        )
        if u4 > in_h:
            # row-group rounding asks for more input rows than exist (tiny
            # inputs, e.g. h=2 with rg=4): the block start clamp
            # ``min(us, h − u4)`` would go negative → negative-offset DMA
            continue
        if est <= _VMEM_BUDGET:
            return r_blk, r_sub, u4, rg
    return None


def _forward(x, k, b, out_h, out_w, interpret):
    n, h, w, c = x.shape
    cout = k.shape[-1]
    plan = _row_block(out_h, out_w, h, w, c, cout)
    assert plan is not None, "gate should have rejected this shape"
    r_blk, r_sub, u4, rg = plan
    us, span = _block_tables(h, out_h, r_blk)
    us = np.minimum(us, h - u4)
    lo, hi, w0, w1 = _vertical_tables(h, out_h)
    os_, is_, dense = _horizontal_chunks(w, out_w)
    whi, wlo = _split_hi_lo(dense)
    whl = np.concatenate([whi, wlo], axis=1)

    w8 = _round_up(w, 8)
    if w8 != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w8 - w), (0, 0)))
    nb = len(us)
    n_chunks, _, k_span = whl.shape
    ws = _round_up(out_w + 2, 8)
    w2 = _round_up(max(ws + 8, 1 + int(max(os_)) + _CHUNK), 8)
    hr = nb * r_blk

    kernel = functools.partial(
        _resize_conv_kernel,
        out_h=out_h, r_blk=r_blk, r_sub=r_sub, u_rows=u4, row_group=rg,
        chunk_starts=tuple((int(o), int(s)) for o, s in zip(os_, is_)),
        k_span=k_span, ws=ws,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(whl.shape, lambda ni, rb, *_: (0, 0, 0)),
            pl.BlockSpec((9, c, cout), lambda ni, rb, *_: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda ni, rb, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, r_blk, ws, cout), lambda ni, rb, *_: (ni, rb, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((u4, w8, c), jnp.bfloat16),
            pltpu.VMEM((rg, w8, c), jnp.bfloat16),
            pltpu.VMEM((u4, w2, c), jnp.float32),
            pltpu.VMEM((r_blk + 2, w2, c), jnp.bfloat16),
            pltpu.VMEM((r_blk + 2, ws, c), jnp.bfloat16),
            pltpu.VMEM((r_blk + 2, ws, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, hr, ws, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(us), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(w0), jnp.asarray(w1),
        x,
        jnp.asarray(whl),
        jnp.asarray(k, jnp.bfloat16).reshape(9, c, cout),
        jnp.asarray(b, jnp.float32).reshape(1, cout),
    )
    return out[:, :out_h, :out_w, :]


def _fwd(x, k, b, out_h, out_w, interpret):
    return fused_resize_conv(x, k, b, out_h, out_w, interpret), (x, k, b)


def _bwd(out_h, out_w, interpret, res, g):
    x, k, b = res
    _, vjp = jax.vjp(lambda *a: xla_resize_conv(*a, out_h, out_w), x, k, b)
    return vjp(g)


fused_resize_conv.defvjp(_fwd, _bwd)


def try_fused_resize_conv(
    x, k, b, out_h: int, out_w: int, interpret: bool = False
):
    """Dispatch gate: fused [2× bilinear resize → conv3×3+bias] when the
    kernel covers the shape, else ``None`` (caller runs the XLA pair).
    Covers bf16 NHWC with lane-full channel counts (C multiple of 128 in,
    Cout = 128 out — the vitl head junction; smaller heads keep the packed
    XLA stack) within the VMEM budget."""
    if x.ndim != 4 or x.dtype != jnp.bfloat16:
        return None
    n, h, w, c = x.shape
    if h < 2 or w < 2 or c % 128 or k.shape[:3] != (3, 3, c):
        return None
    cout = k.shape[-1]
    if cout != 128:
        return None
    if _row_block(out_h, out_w, h, w, c, cout) is None:
        return None
    if not interpret:
        from video_depth_anything_tpu.ops.flash_attention import _on_tpu

        if not _on_tpu():
            return None
    return fused_resize_conv(x, k, b, out_h, out_w, interpret)
