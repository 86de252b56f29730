#!/usr/bin/env python
"""Gradio web demo (capability of reference ``app.py:39-152``).

Wraps the sliding-window pipeline behind a browser UI with the same
controls (max length, target FPS, max resolution).  gradio is not part of
this image's baked environment; the module degrades to a clear message and
the processing function stays importable/testable without it.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def process_video(
    video_path: str,
    encoder: str = "vits",
    max_len: int = -1,
    target_fps: int = -1,
    max_res: int = 1280,
    checkpoint: str | None = None,
    random_init: bool = False,
    output_dir: str | None = None,
):
    """Video file → (input preview path, depth visualization path)."""
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.io.video import read_video_frames, save_video
    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel(encoder)
    if random_init or checkpoint is None:
        model.init_params(jax.random.PRNGKey(0))
    else:
        from video_depth_anything_tpu.io import checkpoint as ckpt_io

        model.params = (
            ckpt_io.load_torch_checkpoint(checkpoint, model.cfg)
            if checkpoint.endswith(".pth")
            else ckpt_io.load_native(checkpoint)
        )

    frames, fps = read_video_frames(video_path, max_len, target_fps, max_res)
    pipe = VideoDepthPipeline(model)
    depths, fps = pipe.infer_video_depth(frames, fps, progress=True)

    out_dir = output_dir or tempfile.mkdtemp(prefix="vda_demo_")
    base = os.path.splitext(os.path.basename(video_path))[0]
    in_path = os.path.join(out_dir, f"{base}_input.mp4")
    depth_path = os.path.join(out_dir, f"{base}_depth.mp4")
    save_video(frames, in_path, fps=fps)
    save_video(depths, depth_path, fps=fps, is_depths=True)
    return in_path, depth_path


def construct_demo(checkpoint: str | None = None):
    import gradio as gr

    with gr.Blocks(title="Video Depth Anything (TPU)") as demo:
        gr.Markdown("# Video Depth Anything — TPU-native")
        with gr.Row():
            inp = gr.Video(label="Input video")
            out_in = gr.Video(label="Preprocessed input")
            out_depth = gr.Video(label="Depth")
        with gr.Row():
            encoder = gr.Dropdown(["vits", "vitl"], value="vits", label="Encoder")
            max_len = gr.Slider(-1, 1000, value=500, step=1, label="Max frames (-1 = all)")
            target_fps = gr.Slider(-1, 30, value=15, step=1, label="Target FPS (-1 = source)")
            max_res = gr.Slider(480, 1920, value=1280, step=2, label="Max resolution")
        btn = gr.Button("Generate depth")

        def _go(video, encoder, max_len, target_fps, max_res):
            return process_video(
                video,
                encoder=encoder,
                max_len=int(max_len),
                target_fps=int(target_fps),
                max_res=int(max_res),
                checkpoint=checkpoint,
                random_init=checkpoint is None,
            )

        btn.click(_go, [inp, encoder, max_len, target_fps, max_res], [out_in, out_depth])
    return demo


if __name__ == "__main__":
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed in this environment; use run.py for CLI "
            "inference or `from app import process_video` programmatically"
        )
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=7860)
    a = ap.parse_args()
    construct_demo(a.checkpoint).queue().launch(server_port=a.port, share=False)
