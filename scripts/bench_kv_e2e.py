#!/usr/bin/env python
"""Chunked KV streaming end-to-end A/B (round-4 verdict item 1).

Full-pipeline wall clock on a real video (preprocess + warmup window +
steady KV steps + full-res D2H) for ``stream_chunk`` ∈ {1, 4, 8}, plain
and aligned.  Each config is pre-warmed on a prefix so compile is
excluded.  The per-frame KV mode is dispatch-bound e2e in this sandbox
(~28 ms tunnel roundtrip vs a ~6 ms device step); chunking K steps into
one ``lax.scan`` program amortizes the dispatch K×.

  python scripts/bench_kv_e2e.py [video] [encoder]
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

    from video_depth_anything_tpu.inference.kv_streaming import (
        KVStreamingPipeline,
    )
    from video_depth_anything_tpu.io.video import read_video_frames
    from video_depth_anything_tpu.models.vda import VDAModel

    frames, fps = read_video_frames(video, -1, -1, 1280)
    print(f"{len(frames)} frames {frames.shape[2]}x{frames.shape[1]}", flush=True)

    model = VDAModel(encoder, dtype=jnp.bfloat16)
    model.init_params(jax.random.PRNGKey(0))

    results = {}
    for aligned in (False, True):
        for chunk in (1, 4, 8):
            pipe = KVStreamingPipeline(
                model, align_each_new_frame=aligned, stream_chunk=chunk
            )
            t0 = time.time()
            pipe.infer(frames[: min(len(frames), 32 + 2 * chunk + 1)])
            compile_s = time.time() - t0
            t0 = time.time()
            d, _ = pipe.infer(frames)
            wall = time.time() - t0
            key = f"{'aligned' if aligned else 'plain'}_chunk{chunk}"
            results[key] = {
                "wall_s": round(wall, 1),
                "e2e_fps": round(d.shape[0] / wall, 2),
                "compile_s": round(compile_s, 1),
                "frames": int(d.shape[0]),
            }
            print(key, results[key], flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
