#!/usr/bin/env python
"""Tune the spatial flash kernel at the vitl encoder shape.

(BH, Np, D) = (512, 1408, 64): 32 frames x 16 heads, 1370 tokens padded to
1408.  Sweeps q-block size for the single-pass kernel and softmax dtype.

  nohup python scripts/bench_spatial.py > /tmp/bench_spatial.log 2>&1 &
"""

from __future__ import annotations

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

    from video_depth_anything_tpu.ops.pallas_attention import (
        flash_attention_bhnd,
    )

    rng = np.random.RandomState(0)
    bh, n_pad, d, n_valid = 512, 1408, 64, 1370
    q = jnp.asarray(rng.randn(bh, n_pad, d) * 0.5, dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(bh, n_pad, d) * 0.5, dtype=jnp.bfloat16)
    v = jnp.asarray(rng.randn(bh, n_pad, d), dtype=jnp.bfloat16)

    def force(out):
        return float(jnp.sum(out[0, :2, :2].astype(jnp.float32)))

    for block_q, sm in [
        (1408, "f32"),
        (1408, "bf16"),  # with the augmented-V row sum the bf16 softmax
                          # also skips the separate p cast — retest
    ]:
        sm_dtype = jnp.float32 if sm == "f32" else jnp.bfloat16
        try:
            fn = lambda: flash_attention_bhnd(
                q, k, v, scale=d**-0.5, n_valid=n_valid,
                block_q=block_q, block_k=0, softmax_dtype=sm_dtype,
            )
            dt = amortized(fn, force)
            # 24 layers per vitl window
            print(json.dumps({
                "block_q": block_q, "softmax": sm,
                "ms_per_call": round(dt * 1e3, 3),
                "ms_per_window_24x": round(dt * 24e3, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"block_q": block_q, "softmax": sm,
                              "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
