#!/usr/bin/env python
"""Encoder-side breakdown: full DinoViT, spatial attention per call, and the
GEMM-only transformer chain, per encoder.  Amortized-dispatch timing (see
docs/PERFORMANCE.md — numbers below ~2 ms carry the host enqueue pedestal).

  nohup python scripts/bench_encoder.py vits > /tmp/bench_encoder.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def amortized(fn, force, iters=20, warmup=3):
    out = fn()
    force(out)
    for _ in range(warmup):
        out = fn()
    force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    force(out)
    return (time.time() - t0) / iters


def main(encoders):
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.dinov2 import DinoViT

    rng = np.random.RandomState(0)

    def force(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.reshape(-1)[:4].astype(jnp.float32)))

    def emit(key, val):
        print(json.dumps({"bench": key, "ms": round(val * 1e3, 2)}), flush=True)

    for encoder in encoders:
        cfg = get_model_config(encoder)
        vit = cfg.vit
        n, hw = 32, 518
        x = jnp.asarray(rng.randn(n, hw, hw, 3) * 0.5, dtype=jnp.bfloat16)
        enc = DinoViT(vit)
        idx = cfg.intermediate_layer_idx
        params = jax.jit(lambda xx: enc.init(jax.random.PRNGKey(0), xx, idx))(x)
        app = jax.jit(lambda p, xx: enc.apply(p, xx, idx))
        emit(f"{encoder}/encoder_full", amortized(lambda: app(params, x), force))

        # spatial attention, one call at the model shape (N tokens = 1+37*37)
        from video_depth_anything_tpu.ops.attention import multi_head_attention

        ntok = 1 + (hw // 14) ** 2
        heads = vit.num_heads
        d = vit.embed_dim // heads
        q = jnp.asarray(rng.randn(n, ntok, heads, d) * 0.3, dtype=jnp.bfloat16)
        k = jnp.asarray(rng.randn(n, ntok, heads, d) * 0.3, dtype=jnp.bfloat16)
        v = jnp.asarray(rng.randn(n, ntok, heads, d) * 0.3, dtype=jnp.bfloat16)
        for impl in ("pallas", "pallas:fast", "xla"):
            fn = jax.jit(
                lambda q, k, v, impl=impl: multi_head_attention(
                    q, k, v, impl=impl
                )
            )
            emit(
                f"{encoder}/spatial_attn_{impl}",
                amortized(lambda: fn(q, k, v), force),
            )

        # transformer GEMM chain only (qkv, proj, mlp for all blocks)
        dim = vit.embed_dim
        wqkv = jnp.asarray(rng.randn(dim, 3 * dim) * 0.02, dtype=jnp.bfloat16)
        wproj = jnp.asarray(rng.randn(dim, dim) * 0.02, dtype=jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(dim, 4 * dim) * 0.02, dtype=jnp.bfloat16)
        w2 = jnp.asarray(rng.randn(4 * dim, dim) * 0.02, dtype=jnp.bfloat16)
        tok = jnp.asarray(rng.randn(n * ntok, dim) * 0.3, dtype=jnp.bfloat16)

        @jax.jit
        def gemms(tok, wqkv, wproj, w1, w2):
            y = tok
            for _ in range(vit.depth):
                qkv = y @ wqkv
                y = (qkv[:, :dim] @ wproj + y).astype(jnp.bfloat16)
                h = jax.nn.gelu(y @ w1, approximate=True)
                y = (h @ w2 + y).astype(jnp.bfloat16)
            return y

        emit(
            f"{encoder}/gemm_chain_{vit.depth}blocks",
            amortized(lambda: gemms(tok, wqkv, wproj, w1, w2), force),
        )


if __name__ == "__main__":
    main(sys.argv[1:] or ["vits"])
