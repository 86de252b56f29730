#!/usr/bin/env python
"""Quickstart: video → depth in ~10 lines (library surface).

  python examples/quickstart.py [video.mp4]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
from video_depth_anything_tpu.io.video import read_video_frames, save_video
from video_depth_anything_tpu.models.vda import VDAModel

video = sys.argv[1] if len(sys.argv) > 1 else (
    "/root/reference/assets/example_videos/davis_rollercoaster.mp4"
)

model = VDAModel("vits", dtype=jnp.bfloat16)
model.init_params(jax.random.PRNGKey(0))  # or io.checkpoint.load_torch_checkpoint(...)

frames, fps = read_video_frames(video, process_length=64, max_res=640)
depths, fps = VideoDepthPipeline(model).infer_video_depth(frames, fps, progress=True)
save_video(depths, "depth.mp4", fps=fps, is_depths=True)
print(f"wrote depth.mp4 ({len(depths)} frames)")
