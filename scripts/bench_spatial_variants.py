#!/usr/bin/env python
"""Experiment: MXU/VPU overlap variants of the native-layout spatial kernel.

The production kernel (ops/pallas_attention.py _flash_kernel_native) runs
QK -> softmax chain -> PV serially per head.  GEMM floor at the vitl shape
is ~2.6 ms/call (both GEMMs 50% MXU at d=64) and the VPU chain ~3.3 ms;
measured 7.1 ms sits near "fully serialized".  Variants here stagger the
stages so MXU work (QK of stream i, PV of stream i-1) is independent of
the VPU chain (stream i-1) in program order, giving the scheduler co-issue
opportunities:

  base     — production kernel source order (serial per head)
  ilv      — the two heads' stages interleaved (QK1 between chain0/PV0)
  nomask   — fast mode without the iota mask: zero-padded K columns score
             exactly 0 -> p=1 -> acc unaffected (V pad rows are zero), row
             sum inflated by exactly (n_pad - n_valid): constant correction
  chunk<k> — q rows split into k chunks, 3-stage software pipeline
             (QK(i) | chain(i-1) | PV(i-2)) with double-buffered score/p

  nohup python scripts/bench_spatial_variants.py > /tmp/bench_sv.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_depth_anything_tpu.ops.pallas_attention import (
    _exp2_poly,
    _round_up,
    flash_attention_native,
)

_LOG2E = 1.4426950408889634


def _kernel_ilv(q_ref, k_ref, v_ref, o_ref, *, d, n_valid, n_pad, nomask):
    """Two heads with stages interleaved in program order."""
    pad = n_pad - n_valid

    def qk(h):
        lo = h * d
        return jax.lax.dot_general(
            q_ref[0, :, lo : lo + d], k_ref[0, :, lo : lo + d],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )

    def chain(s):
        if not nomask:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        p = _exp2_poly(s)
        l = jnp.sum(p, axis=1, keepdims=True)
        if nomask:
            l = l - float(pad)
        return p.astype(v_ref.dtype), l

    def pv(h, p, l):
        lo = h * d
        acc = jax.lax.dot_general(
            p, v_ref[0, :, lo : lo + d],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + d] = (acc / l).astype(o_ref.dtype)

    s0 = qk(0)
    s1 = qk(1)            # MXU, independent of chain(s0)
    p0, l0 = chain(s0)    # VPU
    pv(0, p0, l0)         # MXU, independent of chain(s1)
    p1, l1 = chain(s1)    # VPU
    pv(1, p1, l1)


def _kernel_chunk(
    q_ref, k_ref, v_ref, o_ref, s_buf, p_buf, l_buf, *, d, n_valid, n_pad, nc
):
    """3-stage software pipeline over q-row chunks (both heads folded into
    the stream: stream index = head * nc + chunk)."""
    rows = q_ref.shape[1] // nc
    pad = float(n_pad - n_valid)

    def qk(i, slot):
        h, c = divmod(i, nc)
        lo = h * d
        s_buf[slot] = jax.lax.dot_general(
            q_ref[0, c * rows : (c + 1) * rows, lo : lo + d],
            k_ref[0, :, lo : lo + d],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )

    def chain(slot):
        p = _exp2_poly(s_buf[slot])
        l = jnp.sum(p, axis=1, keepdims=True) - pad
        l_buf[slot] = jnp.broadcast_to(l, l_buf.shape[1:])
        p_buf[slot] = p.astype(p_buf.dtype)

    def pv(i, slot):
        h, c = divmod(i, nc)
        lo = h * d
        acc = jax.lax.dot_general(
            p_buf[slot], v_ref[0, :, lo : lo + d],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, c * rows : (c + 1) * rows, lo : lo + d] = (
            acc / l_buf[slot][:, :1]
        ).astype(o_ref.dtype)

    total = 2 * nc
    for i in range(total + 2):
        if i < total:
            qk(i, i % 2)
        if 1 <= i <= total:
            chain((i - 1) % 2)
        if i >= 2:
            pv(i - 2, (i - 2) % 2)


def _kernel_sbf16(
    q_ref, k_ref, v_ref, o_ref, *, d, n_valid, n_pad, fast, ceiling
):
    """Round-5 probe of the fp32-score-tile VMEM wall (verdict item 8):

    ``sbf16``   — the QK GEMM emits a **bf16 score tile** (MXU still
                  accumulates fp32; the convert rides the copy-out), so the
                  mask/max/sub passes read/write half the bytes; the exp2
                  poly upcasts per element (its bit assembly needs fp32).
                  Output differs from base by bf16 logit quantization.
    ``ceiling`` — the softmax chain deleted entirely (p = s, constant l):
                  invalid math, measures the QK+PV GEMM-pair floor of this
                  exact kernel structure/layout — the most any softmax
                  restructuring could ever recover."""
    nh = q_ref.shape[-1] // d
    for h in range(nh):
        lo = h * d
        # Mosaic requires a 32-bit matmul accumulator, so the bf16 score
        # tile is an explicit post-GEMM cast (one convert pass buys
        # half-width mask/max/sub passes).
        s = jax.lax.dot_general(
            q_ref[0, :, lo : lo + d], k_ref[0, :, lo : lo + d],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if ceiling:
            p16 = s.astype(v_ref.dtype)
            l = jnp.full((s.shape[0], 1), float(n_pad), jnp.float32)
        else:
            s = s.astype(jnp.bfloat16)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, jnp.bfloat16(-1e30))
            if fast:
                p = _exp2_poly(s.astype(jnp.float32))
            else:
                m = jnp.max(s, axis=1, keepdims=True)
                p = _exp2_poly((s - m).astype(jnp.float32))
            l = jnp.sum(p, axis=1, keepdims=True)
            p16 = p.astype(v_ref.dtype)
        acc = jax.lax.dot_general(
            p16, v_ref[0, :, lo : lo + d],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lo : lo + d] = (acc / l).astype(o_ref.dtype)


def run_variant(variant, q, k, v, *, scale, n_valid, num_heads):
    b, n, hd = q.shape
    d = hd // num_heads
    n_pad_q = _round_up(n, 16)
    n_pad = _round_up(n, 128)
    qp = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    qp = jnp.pad(qp, ((0, 0), (0, n_pad_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_pad - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
    scratch = []
    if variant == "ilv":
        kernel = functools.partial(
            _kernel_ilv, d=d, n_valid=n, n_pad=n_pad, nomask=False
        )
    elif variant == "nomask":
        kernel = functools.partial(
            _kernel_ilv, d=d, n_valid=n, n_pad=n_pad, nomask=True
        )
    elif variant in ("sbf16", "sbf16:fast", "ceiling"):
        kernel = functools.partial(
            _kernel_sbf16, d=d, n_valid=n, n_pad=n_pad,
            fast=variant.endswith(":fast"), ceiling=variant == "ceiling",
        )
    elif variant.startswith("chunk"):
        nc = int(variant[5:])
        rows = n_pad_q // nc
        assert n_pad_q % nc == 0 and rows % 8 == 0
        kernel = functools.partial(
            _kernel_chunk, d=d, n_valid=n, n_pad=n_pad, nc=nc
        )
        scratch = [
            pltpu.VMEM((2, rows, n_pad), jnp.float32),
            pltpu.VMEM((2, rows, n_pad), jnp.bfloat16),
            pltpu.VMEM((2, rows, 128), jnp.float32),
        ]
    else:
        raise ValueError(variant)
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qp, kp, vp)
    return out[:, :n]


def amortized(fn, force, iters=20, warmup=3):
    force(fn())
    for _ in range(warmup):
        out = fn()
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    force(out)
    return (time.time() - t0) / iters


def main():
    rng = np.random.RandomState(0)
    n, d = 1370, 64
    for enc, heads, nlayers in (("vitl", 16, 24), ("vits", 6, 12)):
        b = 32
        hd = heads * d
        q = jnp.asarray(rng.randn(b, n, hd) * 0.5, dtype=jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, n, hd) * 0.5, dtype=jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, n, hd), dtype=jnp.bfloat16)

        def force(out):
            return float(jnp.sum(out[0, :2, :2].astype(jnp.float32)))

        ref = flash_attention_native(
            q, k, v, scale=d**-0.5, n_valid=n, num_heads=heads,
            fast_softmax=True,
        )
        base = lambda: flash_attention_native(
            q, k, v, scale=d**-0.5, n_valid=n, num_heads=heads,
            fast_softmax=True,
        )
        dt = amortized(base, force)
        print(json.dumps({"enc": enc, "variant": "base:fast",
                          "ms_per_call": round(dt * 1e3, 3),
                          "ms_window": round(dt * nlayers * 1e3, 1)}),
              flush=True)
        base_exact = lambda: flash_attention_native(
            q, k, v, scale=d**-0.5, n_valid=n, num_heads=heads,
            fast_softmax=False,
        )
        dt = amortized(base_exact, force)
        print(json.dumps({"enc": enc, "variant": "base:exact",
                          "ms_per_call": round(dt * 1e3, 3),
                          "ms_window": round(dt * nlayers * 1e3, 1)}),
              flush=True)

        variants = sys.argv[1:] or [
            "ilv", "nomask", "chunk2", "chunk4", "chunk8",
            "sbf16", "sbf16:fast", "ceiling",
        ]
        for variant in variants:
            try:
                fn = jax.jit(
                    functools.partial(
                        run_variant, variant,
                        scale=d**-0.5, n_valid=n, num_heads=heads,
                    )
                )
                out = fn(q, k, v)
                err = float(
                    jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32)))
                )
                dt = amortized(lambda: fn(q, k, v), force)
                print(json.dumps({
                    "enc": enc, "variant": variant,
                    "ms_per_call": round(dt * 1e3, 3),
                    "ms_window": round(dt * nlayers * 1e3, 1),
                    "max_abs_err_vs_base": round(err, 6),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"enc": enc, "variant": variant,
                                  "error": str(e)[:300]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
