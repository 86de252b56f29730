#!/usr/bin/env python
"""Benchmark evaluation CLI (capability of reference ``eval.py:23-193``).

  python eval.py --dataset kitti --root /data/KITTI --encoder vits \
      --checkpoint ckpt.pth --csv out/kitti_metrics.csv
"""

from __future__ import annotations

import argparse
import json


def normalize_args(args):
    """--original means "no adjustments": force the plain sliding-window
    mode and clear skip_tmp_block (the reference's non-streaming eval branch
    never applies it).  Applying skip_tmp_block in non-streaming eval
    WITHOUT --original is a deliberate extension beyond the reference
    (docs/PARITY.md)."""
    if args.original:
        args.streaming = False
        args.skip_tmp_block = False
    return args


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Video Depth Anything evaluation (TPU)")
    p.add_argument("--dataset", required=True,
                   choices=["kitti", "vkitti", "sintel", "tartanair", "pointodyssey",
                            "dynamicreplica", "sceneflow", "irs"])
    p.add_argument("--root", required=True)
    p.add_argument("--is_val", action="store_true", help="use the val split where defined")
    p.add_argument("--encoder", default="vits", choices=["vits", "vitb", "vitl"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--input_size", type=int, default=518)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--csv", required=True)
    p.add_argument("--max_scenes", type=int, default=None)
    p.add_argument("--max_frames_per_scene", type=int, default=None)
    p.add_argument("--no_tae", action="store_true")
    p.add_argument("--align_only_first_frame", action="store_true")
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--original", action="store_true",
                   help="force plain sliding-window mode, overriding --streaming "
                        "and its flags (ref eval.py:42-43)")
    p.add_argument("--inference_length", type=int, default=32,
                   help="streaming: motion-module context length (ref eval.py:34)")
    p.add_argument("--keyframe_list", type=int, nargs="+", default=[20],
                   help="streaming: keyframe distance schedule (ref eval.py:36 "
                        "default [20]); lists containing 0 are incompatible "
                        "with --align_each_new_frame")
    p.add_argument("--align_each_new_frame", action="store_true",
                   help="streaming: per-frame scale/shift realignment (ref eval.py:39)")
    p.add_argument("--stream_chunk", type=int, default=8,
                   help="steady-state streaming frames batched per device "
                        "dispatch (1 disables chunking; clamped to "
                        "inference_length+max(keyframes)-3; with "
                        "--align_each_new_frame the chunk runs as a "
                        "fit-chained lax.scan)")
    p.add_argument("--ring_dtype", choices=["fp32", "fp16", "bf16"],
                   default=None,
                   help="storage dtype of the aligned mode's emitted-depth "
                        "ring (see run.py --ring_dtype; env VDA_RING_DTYPE)")
    p.add_argument("--skip_tmp_block", action="store_true",
                   help="skip the third motion module (ref eval.py:44)")
    p.add_argument("--kv_cache", action="store_true",
                   help="with --streaming: KV-cache streaming mode (O(1) "
                        "work per frame; extension beyond the reference — "
                        "see run.py --kv_cache).  Combines with "
                        "--align_each_new_frame (on-device pinned-anchor "
                        "realignment)")
    p.add_argument("--data_parallel", action="store_true")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="TP-shard the ViT/motion-FF weights over N chips "
                        "(sliding-window and --kv_cache streaming modes)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="GPipe-stage the encoder block chain over N chips "
                        "(sliding-window mode; see run.py)")
    args = p.parse_args(argv)

    if args.pipeline_parallel > 1 and (
        args.streaming or args.kv_cache or args.data_parallel
        or args.model_parallel > 1
    ):
        raise SystemExit(
            "--pipeline_parallel applies to the sliding-window mode only "
            "and is exclusive with --streaming/--kv_cache/--data_parallel/"
            "--model_parallel"
        )

    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.data import get_dataset
    from video_depth_anything_tpu.evals.evaluate import evaluate_dataset
    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    kwargs = {}
    if args.dataset == "kitti":
        kwargs["is_val"] = args.is_val
    dataset = get_dataset(args.dataset, args.root, **kwargs)

    model = VDAModel(args.encoder, dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    if args.random_init:
        model.init_params(jax.random.PRNGKey(0))
    else:
        from video_depth_anything_tpu.io import checkpoint as ckpt_io

        ckpt = args.checkpoint or f"./checkpoints/video_depth_anything_{args.encoder}.pth"
        model.params = (
            ckpt_io.load_torch_checkpoint(ckpt, model.cfg)
            if ckpt.endswith(".pth")
            else ckpt_io.load_native(ckpt)
        )

    normalize_args(args)

    if args.streaming and args.kv_cache:
        from video_depth_anything_tpu.inference.kv_streaming import (
            KVStreamingPipeline,
        )

        class _KVAdapter:
            def __init__(self, inner, skip_tmp_block):
                self.inner = inner
                self.skip_tmp_block = skip_tmp_block

            def infer_video_depth(self, frames, *a, **k):
                return self.inner.infer(frames, skip_tmp_block=self.skip_tmp_block)

        pipeline = _KVAdapter(
            KVStreamingPipeline(
                model,
                input_size=args.input_size,
                inference_length=args.inference_length,
                align_each_new_frame=args.align_each_new_frame,
                stream_chunk=args.stream_chunk,
                model_parallel=args.model_parallel,
            ),
            args.skip_tmp_block,
        )
    elif args.streaming:
        from video_depth_anything_tpu.inference.streaming import StreamingDepthPipeline

        class _Adapter:
            def __init__(self, inner, skip_tmp_block):
                self.inner = inner
                self.skip_tmp_block = skip_tmp_block

            def infer_video_depth(self, frames, *a, **k):
                return self.inner.infer(frames, skip_tmp_block=self.skip_tmp_block)

        pipeline = _Adapter(
            StreamingDepthPipeline(
                model,
                input_size=args.input_size,
                inference_length=args.inference_length,
                keyframe_list=tuple(args.keyframe_list),
                align_each_new_frame=args.align_each_new_frame,
                chunk_size=args.stream_chunk,
                model_parallel=args.model_parallel,
                ring_dtype=args.ring_dtype,
            ),
            args.skip_tmp_block,
        )
    elif args.pipeline_parallel > 1:
        from video_depth_anything_tpu.parallel.pipeline_parallel import (
            PipelineParallelVideoDepthPipeline,
        )

        pipeline = PipelineParallelVideoDepthPipeline(
            model, pipeline_parallel=args.pipeline_parallel,
            input_size=args.input_size,
        )
    elif args.data_parallel or args.model_parallel > 1:
        from video_depth_anything_tpu.parallel.data_parallel import (
            DataParallelVideoDepthPipeline,
        )

        pipeline = DataParallelVideoDepthPipeline(
            model, input_size=args.input_size,
            model_parallel=args.model_parallel,
        )
    else:
        from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline

        pipeline = VideoDepthPipeline(model, input_size=args.input_size)

    if args.skip_tmp_block and not args.streaming:
        import functools

        pipeline.infer_video_depth = functools.partial(
            pipeline.infer_video_depth, skip_tmp_block=True
        )

    result = evaluate_dataset(
        pipeline,
        dataset,
        args.csv,
        max_scenes=args.max_scenes,
        max_frames_per_scene=args.max_frames_per_scene,
        compute_tae=not args.no_tae,
        align_only_first_frame=args.align_only_first_frame,
    )
    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
