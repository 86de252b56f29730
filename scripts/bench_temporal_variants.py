#!/usr/bin/env python
"""Temporal-attention core variants at the vitl motion-module shapes.

Compares the Pallas kernel's reduce/expand strategies (mxu / vpu / mixed —
see ops/pallas_temporal._temporal_kernel) and the XLA batched einsum, per
shape.  Run with idle host CPUs (docs/PERFORMANCE.md measurement notes).

  nohup python scripts/bench_temporal_variants.py > /tmp/bench_tv.log 2>&1 &
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

    from video_depth_anything_tpu.ops.pallas_temporal import (
        temporal_attention_window,
    )

    heads, t = 8, 32
    shapes = [
        ("m0_1024@37x37", 37 * 37, 1024),
        ("m2_256@37x37", 37 * 37, 256),
        ("m3_256@74x74", 74 * 74, 256),
    ]
    rng = np.random.RandomState(0)

    def xla_core(q, k, v, heads, scale):
        b, t, s, c = q.shape
        d = c // heads
        q5 = q.reshape(b, t, s, heads, d)
        k5 = k.reshape(b, t, s, heads, d)
        v5 = v.reshape(b, t, s, heads, d)
        scores = jnp.einsum(
            "bqshd,bkshd->bshqk", q5, k5, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum(
            "bshqk,bkshd->bqshd", probs, v5, preferred_element_type=jnp.float32
        ).astype(q.dtype)
        return out.reshape(b, t, s, c)

    xla_core = jax.jit(xla_core, static_argnames=("heads", "scale"))

    for name, s, c in shapes:
        scale = (c // heads) ** -0.5
        q = jnp.asarray(rng.randn(1, t, s, c) * 0.5, jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, t, s, c) * 0.5, jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, t, s, c), jnp.bfloat16)

        def force(out):
            return float(jnp.sum(out[0, 0, :2, :2].astype(jnp.float32)))

        rows = {"xla": lambda: xla_core(q, k, v, heads, scale)}
        for bs in (0, 128, 256, 512):
            rows[f"pallas_mxu_bs{bs}"] = (
                lambda bs=bs: temporal_attention_window(
                    q, k, v, heads=heads, scale=scale, block_s=bs
                )
            )
        for label, fn in rows.items():
            try:
                dt = amortized(fn, force)
                print(json.dumps({"shape": name, "impl": label,
                                  "ms": round(dt * 1e3, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"shape": name, "impl": label,
                                  "error": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
