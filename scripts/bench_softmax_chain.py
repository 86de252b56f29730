#!/usr/bin/env python
"""Decompose the single-pass spatial flash kernel's cost at the vitl shape.

Modes swap the elementwise chain between the two GEMMs to locate the VPU
wall (docs/PERFORMANCE.md):

  gemms    QK^T -> cast -> PV                 (no softmax at all)
  exp      QK^T -> exp2 -> cast -> PV         (the ":fast" chain)
  exact    QK^T -> max/sub/exp -> cast -> PV  (production exact chain)
  sexp     QK^T -> Schraudolph exp2 (bit-trick, ~3 VPU ops) -> cast -> PV
  pexp     sexp + cubic-polynomial mantissa correction (<2e-4 rel error)

  nohup python scripts/bench_softmax_chain.py > /tmp/bench_chain.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, nq, nk, d, dv = 512, 1376, 1408, 64, 128
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, nq, d) * 0.35, jnp.bfloat16)
    k = jnp.asarray(rng.randn(bh, nk, d) * 0.35, jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, nk, dv), jnp.bfloat16)

    def make_kernel(mode):
        def kern(q_ref, k_ref, v_ref, o_ref):
            s = jax.lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                preferred_element_type=(
                    jnp.bfloat16 if mode in ("bf16s", "bf16x") else jnp.float32
                ),
            )
            if mode == "gemms":
                p = s
            elif mode == "exp":
                p = jnp.exp2(s)
            elif mode == "exact":
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
            elif mode == "sexp":
                # Schraudolph 2^s: shift the biased exponent field directly.
                i = jnp.asarray(s * (1 << 23) + (127.0 * (1 << 23)), jnp.int32)
                p = jax.lax.bitcast_convert_type(i, jnp.float32)
            elif mode == "pexp":
                # exact exponent via bit trick + cubic mantissa polynomial
                xi = jnp.floor(s)
                xf = s - xi
                i = (jnp.asarray(xi, jnp.int32) + 127) << 23
                scale = jax.lax.bitcast_convert_type(i, jnp.float32)
                # 2^xf on [0,1): minimax-ish cubic
                pf = 1.0 + xf * (0.6951937 + xf * (0.2288332 + xf * 0.0779731))
                p = scale * pf
            elif mode == "bf16s":
                # scores emitted bf16 by the MXU: no fp32 tile, no cast pass
                p = jnp.exp2(s)
            elif mode == "bf16x":
                # bf16 scores + exact max-sub chain in bf16
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp2(s - m)
            else:
                raise ValueError(mode)
            acc = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = acc[:, :d].astype(o_ref.dtype)

        return kern

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(q, k, v, mode):
        return pl.pallas_call(
            make_kernel(mode),
            grid=(bh,),
            in_specs=[
                pl.BlockSpec((1, nq, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, nk, d), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, nk, dv), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nq, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(q, k, v)

    def force(out):
        return float(jnp.sum(out[0, :2, :2].astype(jnp.float32)))

    for mode in ["gemms", "exp", "exact", "sexp", "pexp", "bf16s", "bf16x"]:
        try:
            dt = amortized(lambda: run(q, k, v, mode), force)
            print(json.dumps({"mode": mode, "ms": round(dt * 1e3, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": mode, "error": str(e)[:300]}), flush=True)

    # Apples-to-apples production wrapper (includes q prescale, V augment,
    # divide, custom_vjp dispatch) on the same arrays: the gap to the raw
    # kernel above is pure wrapper overhead.
    from video_depth_anything_tpu.ops.pallas_attention import flash_attention_bhnd

    for fast in (False, True):
        dt = amortized(
            lambda: flash_attention_bhnd(
                q, k, v[:, :, :d], scale=1.0, n_valid=1370,
                block_q=nq, block_k=0, fast_softmax=fast,
            ),
            force,
        )
        print(json.dumps({"mode": f"prod_fast={fast}", "ms": round(dt * 1e3, 3)}),
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
