#!/usr/bin/env python
"""Pipeline-parallel scaling harness (parked measurement, ready to run).

Measures the staged-encoder window forward (``parallel.pipeline_parallel``)
against the single-device forward at each stage count — the on-hardware
PP speedup/bubble curve the sandbox's single TPU cannot produce.  One
command per point on a real multi-chip host:

  python scripts/bench_pp.py                    # single-device baseline
  python scripts/bench_pp.py --stages 2
  python scripts/bench_pp.py --stages 4 --microbatches 16

Prints one JSON line per run (same amortized-dispatch methodology as
bench.py; docs/PERFORMANCE.md "Measurement methodology").  Expected shape
of the curve: ideal = M/(M+S-1) of linear; the tap all_gather and the
per-hop ppermute latency are the deviations to watch (docs/PERFORMANCE.md
"Pipeline parallelism").

CPU smoke test: tests/test_pipeline_parallel.py::test_bench_pp_harness.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(encoder: str, size: int, frames: int, stages: int,
        microbatches, iters: int, warmup: int) -> dict:
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel(encoder, dtype=jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.RandomState(0).randn(1, frames, size, size, 3),
        dtype=model.dtype,
    )

    if stages > 1:
        from video_depth_anything_tpu.parallel.pipeline_parallel import (
            PipelineParallelWindowRunner,
        )

        runner = PipelineParallelWindowRunner(
            model, num_stages=stages, num_microbatches=microbatches
        )
        fwd = runner.infer_window
        m_used = runner._pick_m(frames)
    else:
        fwd = model.infer_window
        m_used = None

    def force(d):
        return float(jnp.sum(d[0, 0, :2, :2]))

    t0 = time.time()
    force(fwd(x))
    compile_s = time.time() - t0
    for _ in range(warmup):
        force(fwd(x))
    t0 = time.time()
    for _ in range(iters):
        d = fwd(x)
    force(d)
    med = (time.time() - t0) / iters
    row = {
        "mode": "pp_window",
        "encoder": encoder,
        "size": size,
        "frames": frames,
        "stages": stages,
        "microbatches": m_used,
        "compile_s": round(compile_s, 2),
        "window_s": round(med, 4),
        "frames_per_s": round(frames / med, 2),
    }
    if stages > 1 and m_used:
        row["ideal_efficiency"] = round(m_used / (m_used + stages - 1), 3)
    return row


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--encoder", default="vits")
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--stages", type=int, default=1,
                   help="1 = unstaged single-device baseline")
    p.add_argument("--microbatches", type=int, default=None)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args(argv)

    from video_depth_anything_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(json.dumps(run(
        args.encoder, args.size, args.frames, args.stages,
        args.microbatches, args.iters, args.warmup,
    )), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
