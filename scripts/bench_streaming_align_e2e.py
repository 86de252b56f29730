#!/usr/bin/env python
"""Aligned feature-cache streaming end-to-end A/B (round-4 items 2 + chunk).

Measures the reference-semantics aligned mode (`--process_single_image
--align_each_new_frame`) on a real video in three configurations:

* host fit (``VDA_DEVICE_ALIGN=0``) — the round-3 path: blocks on every
  frame's D2H because the fit needs previously emitted depths;
* device fit, per-frame — the (s, t) fit and the emitted-depth ring live
  on device; one-frame D2H lag restored;
* device fit, chunked ×8 — K fit-chained steps scanned in one dispatch.

  python scripts/bench_streaming_align_e2e.py [video] [encoder]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    video = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/reference/assets/example_videos/Tokyo-Walk_rgb.mp4"
    )
    encoder = sys.argv[2] if len(sys.argv) > 2 else "vits"

    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.inference.streaming import (
        StreamingDepthPipeline,
    )
    from video_depth_anything_tpu.io.video import read_video_frames
    from video_depth_anything_tpu.models.vda import VDAModel

    frames, _ = read_video_frames(video, -1, -1, 1280)
    print(f"{len(frames)} frames {frames.shape[2]}x{frames.shape[1]}", flush=True)

    model = VDAModel(encoder, dtype=jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))

    kwargs = dict(
        input_size=518, inference_length=32, keyframe_list=(12,),
        align_each_new_frame=True,
    )
    results = {}
    for key, device_align, chunk in (
        ("host_fit", "0", 1),
        ("device_fit", "1", 1),
        ("device_fit_chunk8", "1", 8),
    ):
        os.environ["VDA_DEVICE_ALIGN"] = device_align
        pipe = StreamingDepthPipeline(model, chunk_size=chunk, **kwargs)
        t0 = time.time()
        pipe.infer(frames[: 32 + 12 + 2 * chunk + 1])  # warm compile
        compile_s = time.time() - t0
        t0 = time.time()
        d, _ = pipe.infer(frames)
        wall = time.time() - t0
        results[key] = {
            "wall_s": round(wall, 1),
            "e2e_fps": round(d.shape[0] / wall, 2),
            "compile_s": round(compile_s, 1),
            "frames": int(d.shape[0]),
        }
        print(key, results[key], flush=True)
    os.environ.pop("VDA_DEVICE_ALIGN", None)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
