"""Fused Pallas kernel for the DPT output-stack tail.

The reference head ends with ``output_conv1 → bilinear upsample (8·ph →
14·ph, align_corners=True) → output_conv2`` (``video_depth_anything/dpt.py:
114-124,155-157``, ``dpt_temporal.py:91-97``).  On TPU the XLA lowering of
the [resize → conv3×3 → ReLU → conv1×1 → ReLU] tail is the single most
expensive non-GEMM stretch of the window: the separable resize GEMMs
materialize two (T, 14ph, ·, C) fp32 intermediates in HBM and the convs
re-stream them (vitl 518²: ~19.8 ms resize + ~19.6 ms convs; vits: 8.6 +
18.7 — scripts/bench_head.py, docs/PERFORMANCE.md).  bf16-ing the resize
changed nothing (HBM/transpose-bound, not FLOP-bound), so the fix is
locality, not dtype: this kernel runs the whole tail per (frame,
row-block) inside VMEM and writes only the final 1-channel depth map.

Per program (grid = frames × row-blocks, input frame resident in VMEM and
reused across its row-blocks):

1. **Horizontal resize first** (the separable passes commute; swapping
   lets the wide GEMM consume bf16 input directly): banded chunked GEMMs.
   Dense interpolation-matrix GEMMs are O(out_w·in_w) FLOPs, but each
   output column has exactly 2 taps, so a 128-column output chunk touches
   ≤ ``ceil(128/ratio)+2`` input columns — the per-chunk weight slice is a
   small (128, K) matrix.  fp32 weights are split W = hi + lo into two
   bf16 GEMMs (fp32 accumulate): ~4× MXU rate vs fp32 with ≤ ~1e-7
   relative error vs the exact-fp32 product (far below the bf16 data
   quantization already present upstream).
2. **Vertical resize** as a 2-tap fp32 lerp per output row (VPU): the
   per-row weights (w0, w1) are the exact fp32 values the weight-matrix
   construction produces (``ops.resize.linear_weight_matrix`` arithmetic),
   prefetched as SMEM scalars with the source-row indices.  The result is
   cast to bf16 only after both passes, matching the XLA path's
   fp32-resize→bf16 boundary.
3. **conv3×3** (→ 32ch) as 9 statically-shifted slices of the padded
   resized tile, each flattened to a ((R·Ws), C) × (C, 32) GEMM,
   accumulated in fp32; row shifts slice the major dim (free), column
   shifts pay one in-VMEM relayout each.  Zero conv padding comes from
   zeroed halo rows/columns of the tile.
4. **ReLU → conv1×1 (→ 1ch) → ReLU**, rounding to bf16 between the convs
   exactly where the XLA path does.

Numerics vs the XLA chain: identical tap weights and fp32 interpolation
arithmetic (pass order swapped — fp32-associativity-level differences),
conv accumulation order differs at the fp32-rounding level.  See
``tests/test_output_stack.py`` for the pinned tolerances; the wrapper
returns ``None`` for anything the kernel does not cover (non-bf16, odd
channel counts, VMEM-exceeding shapes, non-TPU) and the caller falls back
to the XLA path — kernel availability is a pure performance concern.

Training differentiates through the fused op: the custom VJP recomputes
the backward through the XLA reference chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_depth_anything_tpu.ops.resize import bilinear_resize

__all__ = ["try_fused_output_tail", "xla_output_tail", "fused_output_tail"]

_MID = 32  # output_conv2_0 width, fixed by the architecture (dpt.py:116-124)
_CHUNK = 256  # output columns per horizontal GEMM chunk (fewer, larger dots)
# The Mosaic scoped-vmem limit is 100 MB; the estimate below tracks the
# compiler's actual allocation within a few MB at the covered shapes
# (vitl 518²: est. ~95.5 MB, compiles at <100).
_VMEM_BUDGET = 97 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Host-side interpolation tables (same fp32 arithmetic as
# ops.resize.linear_weight_matrix — torch align_corners=True semantics).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _vertical_tables(in_size: int, out_size: int):
    """Per-output-row (lo, hi, w0, w1): ``row = w0·x[lo] + w1·x[hi]``."""
    lo = np.zeros(out_size, np.int32)
    hi = np.zeros(out_size, np.int32)
    w0 = np.ones(out_size, np.float32)
    w1 = np.zeros(out_size, np.float32)
    if out_size == 1:
        return lo, hi, w0, w1
    scale = np.float32(in_size - 1) / np.float32(out_size - 1)
    for dst in range(out_size):
        src = np.float32(dst) * scale
        l = min(int(np.floor(src)), in_size - 1)
        h = min(l + 1, in_size - 1)
        frac = float(src) - l
        lo[dst], hi[dst] = l, h
        w0[dst] = np.float32(1.0 - frac)
        w1[dst] = np.float32(frac)
    return lo, hi, w0, w1


@functools.lru_cache(maxsize=None)
def _horizontal_chunks(in_size: int, out_size: int):
    """Banded chunking of the (out, in) interpolation matrix.

    Returns ``(ostarts, istarts, weights (nchunks, _CHUNK, K) fp32)``:
    chunk ``ci`` computes output columns ``[ostarts[ci], +_CHUNK)`` from
    input columns ``[istarts[ci], +K)``.
    """
    lo, hi, w0, w1 = _vertical_tables(in_size, out_size)  # same 1-D math
    dense = np.zeros((out_size, in_size), np.float64)
    for dst in range(out_size):
        dense[dst, lo[dst]] += w0[dst]
        dense[dst, hi[dst]] += w1[dst]
    dense = dense.astype(np.float32)
    # Output chunks: stride _CHUNK, last chunk end-aligned (chunks may
    # overlap in output columns, recomputing identical values — no GEMM
    # rows wasted on zero padding).
    ostarts = list(range(0, out_size, _CHUNK))
    if out_size > _CHUNK and ostarts[-1] + _CHUNK > out_size:
        ostarts[-1] = out_size - _CHUNK
    spans = []
    for o0 in ostarts:
        rows = range(o0, min(o0 + _CHUNK, out_size))
        first = min(lo[r] for r in rows)
        last = max(hi[r] for r in rows)
        spans.append((first, last - first + 1))
    # Input slices come from the row zero-padded to the next multiple of 8;
    # 8-aligned static starts (Mosaic requires provable sublane alignment).
    in_pad = _round_up(in_size, 8)
    k = min(_round_up(max(s for _, s in spans) + 7, 8), in_pad)
    istarts = np.zeros(len(ostarts), np.int32)
    weights = np.zeros((len(ostarts), _CHUNK, k), np.float32)
    for ci, (o0, (first, _)) in enumerate(zip(ostarts, spans)):
        s = max(0, min(first & ~7, in_pad - k))
        istarts[ci] = s
        rows = min(_CHUNK, out_size - o0)
        block = dense[o0 : o0 + rows, s : min(s + k, in_size)]
        weights[ci, :rows, : block.shape[1]] = block
    return np.asarray(ostarts, np.int32), istarts, weights


def _split_hi_lo(w: np.ndarray):
    hi = w.astype(jnp.bfloat16)
    lo = (w - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _pick_row_block(out_h: int, top: int = 104) -> int:
    """Output-row block size: a multiple of 8 (rank-3 out-block sublane
    requirement), minimizing total padded rows, largest block on ties
    (fewer blocks → less redundant horizontal-resize overlap).  ``top``
    caps the block: the dy-lane-stacked conv's larger temporaries need
    ≤ 72 to fit VMEM."""
    best = None
    for r in range(top, 31, -8):
        hr = -(-out_h // r) * r
        if best is None or hr < best[0] or (hr == best[0] and r > best[1]):
            best = (hr, r)
    return best[1]


def _plan(c: int, n: int, out_h: int):
    """(frame_groups, row_block) for a head width / frame count."""
    groups = {32: 4, 64: 2}.get(c, 1)
    if groups > 1 and n % groups:
        groups = 1  # frame count not divisible; run per-frame (rare paths)
    return groups, _pick_row_block(out_h)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _tail_kernel(
    # scalar prefetch
    us_ref,  # (nb,) int32 — first input row held in H2 per row-block
    lo_ref,  # (out_h,) int32
    hi_ref,  # (out_h,) int32
    w0_ref,  # (out_h,) fp32
    w1_ref,  # (out_h,) fp32
    # operands
    x_ref,  # (N, H, W, C) bf16 — stays in HBM; rows DMA'd per block
    whl_ref,  # (nchunks, 2·CHUNK, K) bf16 — hi/lo weight split stacked in M
    wv_ref,  # (1, R+2, U) fp32 — this block's dense vertical-resize matrix
    k1_ref,  # (9, G·C, G·32) bf16 — conv taps (block-diagonal when G>1)
    b1_ref,  # (1, 32) fp32
    k2_ref,  # (1, 32) fp32
    b2_ref,  # (1, 8) fp32
    o_ref,  # (G, R, Ws) bf16 — one row-block of depth per packed frame
    # scratch
    xbuf_ref,  # (U, W, C) bf16 — this block's input-row span
    rowb_ref,  # (RG, W, C) bf16 — staging rows (ref-sliceable per chunk)
    h2_ref,  # (U, W2, C) fp32 — horizontally-resized input rows
    r2_ref,  # (R+2, W2, C) bf16 — fully-resized rows + conv halo
    r2s1_ref,  # (R+2, Ws, C) bf16 — r2 shifted left by 1 column
    r2s2_ref,  # (R+2, Ws, C) bf16 — r2 shifted left by 2 columns
    dma_sem,
    *,
    out_h,
    out_w,
    r_blk,
    r_sub,
    u_rows,
    row_group,  # input rows per horizontal GEMM (lane-concatenated)
    frame_groups,  # frames packed into the lane dim (4 at C=32, 2 at 64)
    chunk_starts,  # static (ostart, 8-aligned istart) per chunk
    k_span,
    ws,
    vertical_impl,  # "gemm" (one dense MXU pass) | "lerp" (per-row unroll)
):
    ni = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * r_blk
    us = us_ref[rb]

    # Fetch only this block's input rows (whole-frame residency would pay
    # the (·, 32)-lane VMEM padding for vits and double-buffering for all).
    # (Lane-offset DMA destinations would let the packing relayout happen
    # in the DMA engine, but Mosaic requires 128-aligned lane slices —
    # frame packing therefore happens in the wrapper.)
    cp = pltpu.make_async_copy(
        x_ref.at[ni, pl.ds(us, u_rows)], xbuf_ref, dma_sem
    )
    cp.start()
    cp.wait()

    h2_ref[...] = jnp.zeros(h2_ref.shape, h2_ref.dtype)

    # -- 1. horizontal resize of the input rows this block needs ------------
    # RG rows ride each GEMM: the chunk weights are shared across rows, so
    # rows lane-concatenate into the rhs N dimension (N = RG·C fills the
    # MXU where one row's C=128 leaves it three-quarters idle per pass
    # group, and quarters the per-dot dispatch overhead).
    rg = row_group
    c = xbuf_ref.shape[-1]

    def hrow(jj, carry):
        j0 = jj * rg
        rowb_ref[...] = xbuf_ref[pl.ds(j0, rg)]  # (RG, W, C) bf16
        for ci, (o0, s) in enumerate(chunk_starts):
            seg = jnp.concatenate(
                [rowb_ref[r, s : s + k_span] for r in range(rg)], axis=-1
            )  # (K, RG·C)
            # hi and lo weight halves ride the GEMM too, stacked in M.
            yhl = jax.lax.dot_general(
                whl_ref[ci], seg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2·CHUNK, RG·C) fp32
            for r in range(rg):
                y = yhl[:_CHUNK, r * c : (r + 1) * c] + yhl[
                    _CHUNK:, r * c : (r + 1) * c
                ]
                # Full-width store: weight rows past out_w are zero → exact
                # zeros land in the halo columns (partial-width stores at a
                # dynamic row index hit an unsupported Mosaic gather path).
                h2_ref[pl.ds(j0 + r, 1), 1 + o0 : 1 + o0 + _CHUNK] = y[None]
        return carry

    jax.lax.fori_loop(0, u_rows // rg, hrow, 0)

    # -- 2. vertical resize into the conv tile (halo rows zero) -------------
    if vertical_impl == "gemm":
        # One dense MXU pass: r2 = Wv @ H2 with the block's (R+2, U)
        # vertical weight matrix (2 taps per row, zero halo rows baked in)
        # against H2 flattened to (U, W2·C) — a minor-dims merge, row-major
        # free.  Replaces the (R+2)-iteration per-row lerp chain that
        # dominated the kernel's overhead (~12 ms over the compute floor at
        # the vitl shape; the fori_loop/unroll forms serialize on the VPU).
        # Note rank-3 dot_general is rejected by Mosaic — the 2-D flatten
        # is what makes this expressible.
        w2c = h2_ref.shape[1]
        c_ = h2_ref.shape[2]
        h2_2d = h2_ref[...].reshape(u_rows, w2c * c_)
        r2 = jax.lax.dot_general(
            wv_ref[0], h2_2d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r2_ref[...] = r2.reshape(r_blk + 2, w2c, c_).astype(r2_ref.dtype)
    else:
        # Statically unrolled (NOT a fori_loop): the loop body is a handful
        # of small ops per row and the sequential fori_loop serializes
        # them; with the rows unrolled Mosaic can overlap the SMEM index
        # loads, the VMEM row reads, and the lerp chains across iterations.
        for i in range(r_blk + 2):
            o = r0 - 1 + i
            oc = jnp.clip(o, 0, out_h - 1)
            a = h2_ref[pl.ds(lo_ref[oc] - us, 1)]
            b = h2_ref[pl.ds(hi_ref[oc] - us, 1)]
            rowv = a * w0_ref[oc] + b * w1_ref[oc]
            valid = jnp.logical_and(o >= 0, o < out_h)
            rowv = jnp.where(valid, rowv, 0.0)
            r2_ref[pl.ds(i, 1)] = rowv.astype(r2_ref.dtype)

    # -- 3+4. conv3×3 → ReLU → conv1×1 → ReLU, in row sub-blocks ------------
    # Sub-blocking bounds the fp32 (·, 32→128-lane-padded) conv temporaries;
    # the 1×1 conv is a lane reduction so the result lands directly in the
    # (rows, Ws) layout of the rank-3 depth output (a (·, 1) GEMM output
    # would need an unsupported sublane→lane relayout).
    # The dx = 1, 2 column shifts are hoisted into two whole-tile copies —
    # misaligned sublane slices relayout-copy anyway, and per-(sub-block,
    # tap) slicing would pay that 24× instead of 2×.  Row (dy) shifts slice
    # the major dim: free.
    # Per-tap block(-diagonal) dots.  A dy-lane-stacked variant (taps in
    # 32-lane output groups, one GEMM per dx) was measured twice and loses
    # both times: over VMEM at the 104-row block; 29.9 ms vs 24.8 at the
    # 72-row block (the lane-group extractions cost more than the MXU's
    # N=32 padding, which is cheaper than the 4× FLOP model suggests).
    r2s1_ref[...] = r2_ref[:, 1 : 1 + ws, :]
    r2s2_ref[...] = r2_ref[:, 2 : 2 + ws, :]
    shifted = (None, r2s1_ref, r2s2_ref)
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
                    src.reshape(rs * ws, c), k1_ref[dy * 3 + dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
        z = acc.astype(jnp.bfloat16) + b1_ref[...].astype(jnp.bfloat16)
        z = jnp.maximum(z, 0)
        # bf16-cast weights, fp32 products/accumulate — the XLA conv's
        # arithmetic exactly (k2 arrives pre-cast to bf16 values in fp32).
        # One lane-reduce per packed frame's 32-lane group, landing each
        # frame's depth rows straight into its output-block slot.
        zr = z.reshape(rs, ws, frame_groups * _MID)
        for f in range(frame_groups):
            grp = zr[..., f * _MID : (f + 1) * _MID]
            y2 = jnp.sum(grp.astype(jnp.float32) * k2_ref[...][0], axis=-1)
            y2 = y2.astype(jnp.bfloat16) + b2_ref[0, 0].astype(jnp.bfloat16)
            o_ref[f, ri : ri + rs] = jnp.maximum(y2, 0)


def _vertical_block_matrix(us, u4, in_h, out_h, r_blk):
    """Dense (nb, r_blk+2, u4) vertical-resize matrices: block rb's matrix
    maps its DMA'd input-row span (offset ``us[rb]``) to its r_blk output
    rows + 2 conv-halo rows; out-of-range halo rows are zero rows."""
    lo, hi, w0, w1 = _vertical_tables(in_h, out_h)
    nb = len(us)
    wv = np.zeros((nb, r_blk + 2, u4), np.float32)
    for rb in range(nb):
        for i in range(r_blk + 2):
            o = rb * r_blk - 1 + i
            if 0 <= o < out_h:
                wv[rb, i, lo[o] - us[rb]] += w0[o]
                wv[rb, i, hi[o] - us[rb]] += w1[o]
    return wv


def _launch(x, whl, k1, b1, k2, b2, tables, out_h, out_w, groups, interpret,
            vertical_impl="gemm"):
    n, h, w, c = x.shape
    w8 = _round_up(w, 8)
    if w8 != w:  # chunk starts are clamped against the padded width
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w8 - w), (0, 0)))
        w = w8
    # x arrives frame-packed: (N/G, H, W, G·C); each program emits G frames.
    us, lo, hi, w0, w1, os_, is_, u_rows = tables
    nb = len(us)
    cl = c  # VMEM lane width (= G·C_head, frames already packed)
    r_blk = _pick_row_block(out_h)
    r_sub = r_blk if r_blk <= 24 else -(-r_blk // 4)
    n_chunks, _, k_span = whl.shape
    ws = _round_up(out_w + 2, 8)
    w2 = _round_up(max(ws + 8, 1 + int(max(os_)) + _CHUNK), 8)
    hr = nb * r_blk
    rg = 4 if cl == 128 and _round_up(u_rows, 4) <= h else 1
    u4 = _round_up(u_rows, rg)
    us = np.minimum(us, h - u4)  # keep the DMA'd span in bounds
    if vertical_impl == "gemm":
        wv = _vertical_block_matrix(us, u4, h, out_h, r_blk)
        wv_spec = pl.BlockSpec((1, r_blk + 2, u4), lambda ni, rb, *_: (rb, 0, 0))
    else:
        # "lerp" (production default) never reads wv_ref — ship a 1-element
        # dummy instead of DMA'ing the dense matrix into VMEM every grid
        # block for a measured-and-rejected variant (advisor r3).
        wv = np.zeros((1, 1, 1), np.float32)
        wv_spec = pl.BlockSpec((1, 1, 1), lambda ni, rb, *_: (0, 0, 0))

    kernel = functools.partial(
        _tail_kernel,
        out_h=out_h, out_w=out_w, r_blk=r_blk, r_sub=r_sub, u_rows=u4,
        row_group=rg, frame_groups=groups,
        chunk_starts=tuple(
            (int(o), int(s)) for o, s in zip(os_, is_)
        ),
        k_span=k_span, ws=ws, vertical_impl=vertical_impl,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(whl.shape, lambda ni, rb, *_: (0, 0, 0)),
            wv_spec,
            pl.BlockSpec(k1.shape, lambda ni, rb, *_: (0, 0, 0)),
            pl.BlockSpec(b1.shape, lambda ni, rb, *_: (0, 0)),
            pl.BlockSpec(k2.shape, lambda ni, rb, *_: (0, 0)),
            pl.BlockSpec(b2.shape, lambda ni, rb, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (groups, r_blk, ws), lambda ni, rb, *_: (ni, rb, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((u4, w, cl), jnp.bfloat16),
            pltpu.VMEM((rg, w, cl), jnp.bfloat16),
            pltpu.VMEM((u4, w2, cl), jnp.float32),
            pltpu.VMEM((r_blk + 2, w2, cl), jnp.bfloat16),
            pltpu.VMEM((r_blk + 2, ws, cl), jnp.bfloat16),
            pltpu.VMEM((r_blk + 2, ws, cl), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n * groups, hr, ws), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(us), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(w0), jnp.asarray(w1),
        x, whl, jnp.asarray(wv), k1, b1, k2, b2,
    )
    return out[:, :out_h, :out_w, None]


@functools.lru_cache(maxsize=None)
def _block_tables(in_h: int, out_h: int, r_blk: int):
    """Per-row-block first-source-row (us) and the static span U of input
    rows DMA'd per block; ``us`` is clamped so ``[us, us+U) ⊆ [0, in_h)``
    (clamping down only widens the fetched span backwards)."""
    lo, hi, w0, w1 = _vertical_tables(in_h, out_h)
    nb = -(-out_h // r_blk)
    us = np.zeros(nb, np.int32)
    span = 0
    for rb in range(nb):
        first = lo[max(rb * r_blk - 1, 0)]
        last = hi[min(rb * r_blk + r_blk, out_h - 1)]
        us[rb] = first
        span = max(span, last - first + 1)
    span = min(span, in_h)
    us = np.minimum(us, in_h - span).astype(np.int32)
    return us, span


def xla_output_tail(x, k1, b1, k2, b2, out_h: int, out_w: int):
    """Reference XLA chain the kernel must match (numerics oracle and
    custom-VJP backward): resize → conv3×3+b → ReLU → conv1×1+b → ReLU,
    bf16 rounding at the same points as ``models/dpt.py _output_head``."""
    y = bilinear_resize(x, out_h, out_w)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        y, k1.astype(y.dtype), (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    ) + b1.astype(y.dtype)
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(
        y, k2.astype(y.dtype), (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn
    ) + b2.astype(y.dtype)
    return jax.nn.relu(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_output_tail(x, k1, b1, k2, b2, out_h, out_w, interpret=False):
    """Fused kernel entry; differentiable (backward = XLA chain VJP)."""
    return _forward(x, k1, b1, k2, b2, out_h, out_w, interpret)


def _forward(x, k1, b1, k2, b2, out_h, out_w, interpret):
    n, h, w, c = x.shape
    groups, r_blk = _plan(c, n, out_h)
    us, span = _block_tables(h, out_h, r_blk)
    lo, hi, w0, w1 = _vertical_tables(h, out_h)
    os_, is_, dense = _horizontal_chunks(w, out_w)
    whi, wlo = _split_hi_lo(dense)
    whl = np.concatenate([whi, wlo], axis=1)  # (nchunks, 2·CHUNK, K)
    tables = (us, lo, hi, w0, w1, os_, is_, span)
    k1r = jnp.asarray(k1, jnp.bfloat16)  # (3, 3, C, 32)
    # Small-channel heads (vits C=32, vitb C=64) pack 4/2 consecutive
    # frames into the 128-lane dim: resize is per-lane (frames are just
    # more channels), the conv gets block-diagonal weights (zero
    # cross-frame terms — per-frame math is exact), and the grid shrinks
    # by the same factor.  Without this the kernel's 128-lane GEMMs would
    # do vitl-scale work for a vits-sized problem.
    if groups > 1:
        # Pack consecutive frames into the lane dim (one XLA relayout of
        # the input map); conv weights go block-diagonal (zero cross-frame
        # terms: per-frame math exact), output lanes G·32 full.
        x = (
            x.reshape(n // groups, groups, h, w, c)
            .transpose(0, 2, 3, 1, 4)
            .reshape(n // groups, h, w, groups * c)
        )
        k1bd = jnp.zeros((3, 3, groups * c, groups * _MID), jnp.bfloat16)
        for f in range(groups):
            k1bd = k1bd.at[
                :, :, f * c : (f + 1) * c, f * _MID : (f + 1) * _MID
            ].set(k1r)
        k1p = k1bd.reshape(9, groups * c, groups * _MID)
    else:
        k1p = k1r.reshape(9, c, _MID)
    b1p = jnp.tile(jnp.asarray(b1, jnp.float32).reshape(1, _MID), (1, groups))
    # bf16-cast values carried in fp32 (the kernel's 1×1 is a lane-reduce
    # with fp32 products of bf16 values — the XLA conv's arithmetic).
    k2p = (
        jnp.asarray(k2, jnp.bfloat16).astype(jnp.float32).reshape(1, _MID)
    )
    b2p = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(
        jnp.asarray(b2, jnp.float32).reshape(())
    )
    import os

    # "lerp" (default): unrolled per-row 2-tap chain.  "gemm": one dense
    # (R+2, U) MXU pass — measured-and-rejected on v5e (c128 24.6 → 26.8,
    # c32 16.5 → 17.8 ms): materializing the whole fp32 H2 tile as a GEMM
    # operand costs more than the row loop it replaces, so the kernel is
    # NOT row-loop-bound (docs/PERFORMANCE.md round-3 note).
    return _launch(
        x, jnp.asarray(whl), k1p, b1p, k2p, b2p,
        tables, out_h, out_w, groups, interpret,
        vertical_impl=os.environ.get("VDA_TAIL_VERTICAL", "lerp"),
    )


def _fwd(x, k1, b1, k2, b2, out_h, out_w, interpret):
    return fused_output_tail(x, k1, b1, k2, b2, out_h, out_w, interpret), (
        x, k1, b1, k2, b2,
    )


def _bwd(out_h, out_w, interpret, res, g):
    x, k1, b1, k2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: xla_output_tail(*a, out_h, out_w), x, k1, b1, k2, b2
    )
    return vjp(g)


fused_output_tail.defvjp(_fwd, _bwd)


def _vmem_estimate(n, h, w, c, out_h, out_w) -> int:
    groups, r_blk = _plan(c, n, out_h)
    cl = max(groups * c, 128)  # VMEM lane padding
    r_sub = r_blk if r_blk <= 24 else -(-r_blk // 4)
    _, span = _block_tables(h, out_h, r_blk)
    ws = _round_up(out_w + 2, 8)
    w2 = _round_up(max(ws + 8, 1 + max(out_w, _CHUNK)), 8)
    xbuf = span * _round_up(w, 8) * cl * 2
    h2 = span * w2 * cl * 4
    r2 = (r_blk + 2) * (w2 + 2 * ws) * cl * 2  # + the two shifted copies
    # conv sub-block temporaries lane-pad the fp32 acc/y to 128 lanes
    conv_tmp = 3 * (r_sub + 2) * ws * cl * 2 + 3 * (r_sub + 2) * ws * 128 * 4
    return xbuf + h2 + r2 + conv_tmp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def try_fused_output_tail(
    x, k1, b1, k2, b2, out_h: int, out_w: int, interpret: bool = False
):
    """Dispatch gate: fused kernel when it covers the shape, else ``None``
    (caller falls back to the XLA chain).  Covers bf16 NHWC inputs with
    C ∈ {32, 64, 128} (vits/vitb/vitl head widths) on TPU, within the
    VMEM budget."""
    if x.ndim != 4 or x.dtype != jnp.bfloat16:
        return None
    n, h, w, c = x.shape
    if c not in (32, 64, 128) or h < 2 or w < 2:
        return None
    if tuple(k1.shape) != (3, 3, c, _MID) or int(np.prod(k2.shape)) != _MID:
        return None
    if _vmem_estimate(n, h, w, c, out_h, out_w) > _VMEM_BUDGET:
        return None
    if not interpret and not _on_tpu():
        return None
    return fused_output_tail(x, k1, b1, k2, b2, out_h, out_w, interpret)
