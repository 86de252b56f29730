#!/usr/bin/env python
"""Flash backward kernel vs einsum backward at the encoder model shapes.

Times grad(sum(attn*g)) wrt (q, k, v) for both backward impls; the forward
kernel is identical, so the delta is the backward cost.  Also the Mosaic
compile check for the backward kernel's dim-0 contractions.

  nohup python scripts/bench_flash_bwd.py > /tmp/bench_flash_bwd.log 2>&1 &
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

from video_depth_anything_tpu.ops.pallas_attention import flash_attention_native


def amortized(fn, force, iters=10, warmup=2):
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
    for enc, heads in (("vits", 6), ("vitl", 16)):
        b = 32
        hd = heads * d
        q = jnp.asarray(rng.randn(b, n, hd) * 0.5, dtype=jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, n, hd) * 0.5, dtype=jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, n, hd), dtype=jnp.bfloat16)
        g = jnp.asarray(rng.randn(b, n, hd), dtype=jnp.bfloat16)

        def force(out):
            leaf = jax.tree.leaves(out)[0]
            return float(jnp.sum(leaf[0, :2, :2].astype(jnp.float32)))

        grads = {}
        for impl in ("pallas", "einsum"):
            def loss(q, k, v, impl=impl):
                out = flash_attention_native(
                    q, k, v, scale=d**-0.5, n_valid=n, num_heads=heads,
                    fast_softmax=True, bwd_impl=impl,
                )
                return jnp.sum((out * g).astype(jnp.float32))

            fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                grads[impl] = fn(q, k, v)
                dt = amortized(lambda: fn(q, k, v), force)
                print(json.dumps({
                    "enc": enc, "bwd_impl": impl,
                    "ms_fwd_plus_bwd": round(dt * 1e3, 3),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"enc": enc, "bwd_impl": impl,
                                  "error": str(e)[:400]}), flush=True)
        if len(grads) == 2:
            errs = [
                float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b_.astype(jnp.float32))))
                for a, b_ in zip(grads["pallas"], grads["einsum"])
            ]
            print(json.dumps({"enc": enc,
                              "max_abs_err_dq_dk_dv": [round(e, 5) for e in errs]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
