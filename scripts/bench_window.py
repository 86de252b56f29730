#!/usr/bin/env python
"""Full-window throughput at the reference benchmark shape (1×32×518×518).

  nohup python scripts/bench_window.py [vits vitl ...] > /tmp/bench_window.log 2>&1 &

Each encoder runs with the default (exact) and the ":fast" attention
implementation.  Measurement follows docs/PERFORMANCE.md: dispatch K
windows back-to-back, force once via a scalar tap.  Host CPUs must be
otherwise idle — the dispatch loop shares 2 cores with anything else, and
contention inflates amortized timings (this produced the bogus "VPU-bound"
readings this file's history refers to).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(encoders):
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.models.vda import VDAModel

    x = None
    for encoder in encoders:
        for impl in ("auto", "auto:fast"):
            model = VDAModel(encoder, dtype=jnp.bfloat16, attn_impl=impl)
            model.init_params(jax.random.PRNGKey(0))
            if x is None:
                x = jax.device_put(jnp.asarray(
                    np.random.randn(1, 32, 518, 518, 3), dtype=jnp.bfloat16
                ))
            force = lambda d: float(jnp.sum(d[0, 0, :2, :2]))
            t0 = time.time()
            force(model.infer_window(x))
            compile_s = time.time() - t0
            for _ in range(3):
                force(model.infer_window(x))
            t0 = time.time()
            d = None
            for _ in range(10):
                d = model.infer_window(x)
            force(d)
            med = (time.time() - t0) / 10
            print(json.dumps({
                "encoder": encoder, "impl": impl,
                "compile_s": round(compile_s, 1),
                "window_ms": round(med * 1e3, 1),
                "fps": round(32 / med, 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:] or ["vits", "vitl"]))
