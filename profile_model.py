#!/usr/bin/env python
"""Model profiling CLI (capability of reference
``Test_singleImage_processing.py``): params/FLOPs split, per-component
timings, optional profiler trace.

  python profile_model.py --encoder vits --size 518 --frames 32
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--encoder", default="vits", choices=["vits", "vitb", "vitl"])
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=518)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--trace_dir", default=None, help="write a jax.profiler trace")
    p.add_argument("--skip_timing", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.utils.profiling import (
        compiled_cost,
        component_timings,
        param_counts,
        trace,
    )

    model = VDAModel(args.encoder, dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))

    report = {"encoder": args.encoder, "frames": args.frames, "size": args.size}
    report.update(param_counts(model.params))

    x = jnp.zeros((1, args.frames, args.size, args.size, 3), dtype=model.dtype)
    report["compiled"] = compiled_cost(
        lambda p, xx: model.module.apply({"params": p}, xx), model.params, x
    )

    if not args.skip_timing:
        with trace(args.trace_dir):
            report["timings"] = component_timings(model, args.frames, args.size)
        t = report["timings"]["full"]["median_s"]
        report["frames_per_s"] = round(args.frames / t, 2)

    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
