#!/usr/bin/env python
"""A/B the reduced-precision aligned depth ring (``VDA_RING_DTYPE``).

Over the 200-frame drifting-gradient scene (same methodology as
``tests/test_kv_streaming.py::test_kv_drift_bounded_over_long_video``),
measures what quantizing the (s, t) fit references to fp16/bf16 does to
the aligned feature-cache streaming output, relative to the fp32 ring:

  python scripts/bench_ring_dtype.py [--frames 200] [--input_size 28]

Prints one JSON row per ring dtype: ring bytes, per-frame relative
deviation vs the fp32-ring output (mean / tail-50 mean / peak), and —
as the semantic anchor — each variant's drift vs the batch sliding-window
pipeline (the fp32 row's numbers are the baseline the others should
match).  Math-only measurement: runs on CPU; numbers are
hardware-independent.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def drift_scene(n, h=36, w=44):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.stack(
                [
                    (xx * 4 + 2 * t) % 256,
                    (yy * 4 + t) % 256,
                    ((xx + yy) * 2 + t) % 256,
                ],
                axis=-1,
            )
            for t in range(n)
        ]
    ).astype(np.uint8)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--input_size", type=int, default=28)
    p.add_argument("--inference_length", type=int, default=6)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import flax
    import jax.numpy as jnp

    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.inference.streaming import (
        StreamingDepthPipeline,
    )
    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(jax.random.PRNGKey(5))
    params = flax.core.unfreeze(model.params)
    prng = np.random.RandomState(9)
    for name in ("motion_0", "motion_1", "motion_2", "motion_3"):
        k = params["head"][name]["proj_out"]["kernel"]
        params["head"][name]["proj_out"]["kernel"] = 0.02 * jnp.asarray(
            prng.randn(*k.shape), jnp.float32
        )
    model.params = params

    frames = drift_scene(args.frames)
    want_batch, _ = VideoDepthPipeline(
        model, input_size=args.input_size, window_batch=1
    ).infer_video_depth(frames)

    kwargs = dict(
        input_size=args.input_size,
        inference_length=args.inference_length,
        keyframe_list=(2,),
        align_each_new_frame=True,
    )
    outs = {}
    for ring in ("fp32", "fp16", "bf16"):
        pipe = StreamingDepthPipeline(model, ring_dtype=ring, **kwargs)
        out, _ = pipe.infer(frames)
        ring_bytes = (
            pipe.cache_len
            * frames.shape[1]
            * frames.shape[2]
            * jnp.dtype(pipe.ring_dtype).itemsize
        )
        outs[ring] = (out, ring_bytes)

    ref = outs["fp32"][0]
    scale = np.abs(ref).mean() + 1e-8
    batch_ref = want_batch[1 : 1 + ref.shape[0]]
    for ring, (out, ring_bytes) in outs.items():
        rel = np.abs(out - ref).mean(axis=(1, 2)) / scale
        drift = np.abs(out - batch_ref).mean(axis=(1, 2)) / (
            np.abs(batch_ref).mean() + 1e-8
        )
        print(
            json.dumps(
                {
                    "ring_dtype": ring,
                    "ring_bytes": int(ring_bytes),
                    "vs_fp32_ring_mean": round(float(rel.mean()), 6),
                    "vs_fp32_ring_tail50": round(float(rel[-50:].mean()), 6),
                    "vs_fp32_ring_peak": round(float(rel.max()), 6),
                    "vs_batch_tail50": round(float(drift[-50:].mean()), 4),
                    "vs_batch_peak": round(float(drift.max()), 4),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
