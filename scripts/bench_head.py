#!/usr/bin/env python
"""DPT-head component split at the real window shapes.

Times the full head apply, the head with motion modules stubbed to
identity (→ conv/resize share), and the fp32 output island, per encoder.

  nohup python scripts/bench_head.py > /tmp/bench_head.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def amortized(fn, force, iters=10, warmup=3):
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

    import video_depth_anything_tpu.models.dpt as dptm
    from video_depth_anything_tpu.config import get_model_config

    rng = np.random.RandomState(0)

    def force(out):
        return float(jnp.sum(out.reshape(-1)[:4].astype(jnp.float32)))

    for encoder in ("vits", "vitl"):
        cfg = get_model_config(encoder)
        head = dptm.DPTHeadTemporal(cfg)
        n, ph, pw = 32, 37, 37
        feats = [
            jnp.asarray(
                rng.randn(n, ph * pw, cfg.vit.embed_dim) * 0.5,
                dtype=jnp.bfloat16,
            )
            for _ in range(4)
        ]
        params = jax.jit(
            lambda f: head.init(jax.random.PRNGKey(0), f, 1, n, ph, pw)
        )(feats)

        app = jax.jit(lambda p, f: head.apply(p, f, 1, n, ph, pw))
        dt_full = amortized(lambda: app(params, feats), force)
        print(json.dumps({"bench": f"{encoder}/head_full",
                          "ms": round(dt_full * 1e3, 2)}), flush=True)

        # stub motion modules -> conv/resize/output share only
        orig = dptm.DPTHeadTemporal._temporal
        dptm.DPTHeadTemporal._temporal = lambda self, m, x, b: x
        try:
            app2 = jax.jit(lambda p, f: head.apply(p, f, 1, n, ph, pw))
            dt_convs = amortized(lambda: app2(params, feats), force)
        finally:
            dptm.DPTHeadTemporal._temporal = orig
        print(json.dumps({
            "bench": f"{encoder}/head_convs_only",
            "ms": round(dt_convs * 1e3, 2),
            "motion_derived_ms": round((dt_full - dt_convs) * 1e3, 2),
        }), flush=True)

        # fp32 output island alone (output_conv1 -> resize -> conv2 stack)
        f = cfg.features
        path1 = jnp.asarray(
            rng.randn(n, ph * 8, pw * 8, f) * 0.5, dtype=jnp.bfloat16
        )
        out_fn = jax.jit(
            lambda p, x: head.apply(
                p, x, ph, pw, method=lambda m, x, a, b: m._output_head(x, a, b)
            )
        )
        dt_out = amortized(lambda: out_fn(params, path1), force)
        print(json.dumps({"bench": f"{encoder}/output_head",
                          "ms": round(dt_out * 1e3, 2)}), flush=True)

        # decompose the output stack
        from video_depth_anything_tpu.ops.resize import bilinear_resize

        c1 = jax.jit(lambda p, x: head.apply(
            p, x, method=lambda m, x: m.output_conv1(x)))
        dt = amortized(lambda: c1(params, path1), force)
        print(json.dumps({"bench": f"{encoder}/out_conv1_296",
                          "ms": round(dt * 1e3, 2)}), flush=True)

        half = jnp.asarray(
            rng.randn(n, ph * 8, pw * 8, f // 2) * 0.5, dtype=jnp.bfloat16
        )
        rs = jax.jit(lambda x: bilinear_resize(x, ph * 14, pw * 14))
        dt = amortized(lambda: rs(half), force)
        print(json.dumps({"bench": f"{encoder}/resize_296to518_c{f//2}",
                          "ms": round(dt * 1e3, 2)}), flush=True)

        big = jnp.asarray(
            rng.randn(n, ph * 14, pw * 14, f // 2) * 0.5, dtype=jnp.bfloat16
        )
        c2 = jax.jit(lambda p, x: head.apply(
            p, x,
            method=lambda m, x: m.output_conv2_2(
                jax.nn.relu(m.output_conv2_0(x))
            ),
        ))
        dt = amortized(lambda: c2(params, big), force)
        print(json.dumps({"bench": f"{encoder}/out_conv2_stack_518",
                          "ms": round(dt * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
