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

    for block_q, fast in [
        (1408, False),
        (1408, True),   # no-max poly-exp2 softmax (":fast")
        (1376, True),   # + sublane-aligned q rows (the model config)
        (1376, False),
    ]:
        try:
            fn = lambda: flash_attention_bhnd(
                q[:, :block_q] if block_q < n_pad else q,
                k, v, scale=d**-0.5, n_valid=n_valid,
                block_q=block_q, block_k=0, fast_softmax=fast,
            )
            dt = amortized(fn, force)
            # 24 layers per vitl window
            print(json.dumps({
                "block_q": block_q, "fast": fast,
                "ms_per_call": round(dt * 1e3, 3),
                "ms_per_window_24x": round(dt * 24e3, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"block_q": block_q, "fast": fast,
                              "error": str(e)[:200]}), flush=True)

    # Full adapter paths at the model shape (B, N, H, D) = (32, 1370, 16, 64):
    # classic (transpose/pad/augment wrapper) vs native-layout kernel.
    from video_depth_anything_tpu.ops.pallas_attention import (
        flash_attention_native,
        spatial_flash_attention,
    )

    b, n, h = 32, 1370, 16
    q4 = jnp.asarray(rng.randn(b, n, h, d) * 0.5, dtype=jnp.bfloat16)
    k4 = jnp.asarray(rng.randn(b, n, h, d) * 0.5, dtype=jnp.bfloat16)
    v4 = jnp.asarray(rng.randn(b, n, h, d), dtype=jnp.bfloat16)
    qm, km, vm = (x.reshape(b, n, h * d) for x in (q4, k4, v4))

    def force4(out):
        return float(jnp.sum(out[0, :2, 0].astype(jnp.float32)))

    cases = {
        "classic(B,N,H,D)": lambda: spatial_flash_attention(q4, k4, v4, d**-0.5),
        "native(B,N,HD)": lambda: flash_attention_native(
            qm, km, vm, scale=d**-0.5, n_valid=n, num_heads=h
        ),
        "native:fast": lambda: flash_attention_native(
            qm, km, vm, scale=d**-0.5, n_valid=n, num_heads=h, fast_softmax=True
        ),
    }
    for name, fn in cases.items():
        try:
            dt = amortized(fn, force4)
            print(json.dumps({
                "path": name,
                "ms_per_call": round(dt * 1e3, 3),
                "ms_per_window_24x": round(dt * 24e3, 1),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"path": name, "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
