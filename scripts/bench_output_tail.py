#!/usr/bin/env python
"""Fused output-tail kernel: TPU numerics check + window A/B.

  nohup python scripts/bench_output_tail.py [vits vitl ...] > log 2>&1 &

For each encoder: run the full window forward with ``fused_output_tail``
off and on (same params, same input), report max relative depth deviation
and the window timing both ways (docs/PERFORMANCE.md methodology).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(model, x, iters=10):
    import jax.numpy as jnp

    force = lambda d: float(jnp.sum(d[0, 0, :2, :2].astype(jnp.float32)))
    t0 = time.time()
    force(model.infer_window(x))
    compile_s = time.time() - t0
    for _ in range(3):
        force(model.infer_window(x))
    t0 = time.time()
    d = None
    for _ in range(iters):
        d = model.infer_window(x)
    force(d)
    return compile_s, (time.time() - t0) / iters


def bench_kernel_only(iters=20):
    """Standalone kernel vs XLA chain at the real head shapes."""
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.ops.pallas_output_stack import (
        fused_output_tail, xla_output_tail,
    )

    rng = np.random.default_rng(0)
    # cost of the frame-pack relayout alone (groups=4 vits case)
    xs = jnp.asarray(rng.standard_normal((32, 296, 296, 32)), jnp.bfloat16)
    pack = jax.jit(
        lambda x: x.reshape(8, 4, 296, 296, 32)
        .transpose(0, 2, 3, 1, 4)
        .reshape(8, 296, 296, 128)
    )
    force = jax.jit(lambda d: jnp.sum(d[0, :2, :2].astype(jnp.float32)))
    float(force(pack(xs)))  # warm both programs before timing
    t0 = time.time()
    d = None
    for _ in range(iters):
        d = pack(xs)
    float(force(d))
    print(json.dumps({
        "bench": "output_tail/frame_pack_relayout",
        "ms": round((time.time() - t0) / iters * 1e3, 2),
    }), flush=True)

    for c in (128, 32):
        x = jnp.asarray(rng.standard_normal((32, 296, 296, c)), jnp.bfloat16)
        k1 = jnp.asarray(rng.standard_normal((3, 3, c, 32)) * 0.05, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
        k2 = jnp.asarray(rng.standard_normal((1, 1, 32, 1)) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
        for name, fn in (
            ("fused", jax.jit(lambda *a: fused_output_tail(*a, 518, 518, False))),
            ("xla", jax.jit(lambda *a: xla_output_tail(*a, 518, 518))),
        ):
            force = lambda d: float(jnp.sum(d[0, :2, :2].astype(jnp.float32)))
            t0 = time.time()
            force(fn(x, k1, b1, k2, b2))
            compile_s = time.time() - t0
            for _ in range(3):
                force(fn(x, k1, b1, k2, b2))
            t0 = time.time()
            d = None
            for _ in range(iters):
                d = fn(x, k1, b1, k2, b2)
            force(d)
            ms = (time.time() - t0) / iters * 1e3
            print(json.dumps({
                "bench": f"output_tail/{name}_c{c}",
                "ms": round(ms, 2), "compile_s": round(compile_s, 1),
            }), flush=True)
    return 0


def main(encoders):
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.config import get_model_config
    from video_depth_anything_tpu.models.vda import VDAModel

    if encoders == ["--kernel"]:
        return bench_kernel_only()

    x = jax.device_put(jnp.asarray(
        np.random.randn(1, 32, 518, 518, 3), dtype=jnp.bfloat16
    ))
    for encoder in encoders:
        base_cfg = get_model_config(encoder)
        off = VDAModel(
            encoder, dtype=jnp.bfloat16,
            cfg=dataclasses.replace(base_cfg, fused_output_tail=False),
        )
        off.init_params(jax.random.PRNGKey(0))
        on = VDAModel(
            encoder, dtype=jnp.bfloat16,
            cfg=dataclasses.replace(base_cfg, fused_output_tail=True),
            params=off.params,
        )
        d_off = np.asarray(off.infer_window(x), np.float32)
        d_on = np.asarray(on.infer_window(x), np.float32)
        dev = float(np.abs(d_on - d_off).max() / (np.abs(d_off).max() + 1e-9))
        c_off, t_off = bench(off, x)
        c_on, t_on = bench(on, x)
        print(json.dumps({
            "encoder": encoder,
            "max_rel_depth_deviation": round(dev, 6),
            "window_ms_off": round(t_off * 1e3, 1),
            "window_ms_on": round(t_on * 1e3, 1),
            "fps_off": round(32 / t_off, 1),
            "fps_on": round(32 / t_on, 1),
            "compile_s": [round(c_off, 1), round(c_on, 1)],
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["vits", "vitl"]))
