#!/usr/bin/env python
"""CLI video→depth inference (capability surface of reference ``run.py:27-166``).

Examples:
  python run.py --input_video /root/reference/assets/example_videos/davis_rollercoaster.mp4 \
      --output_dir ./outputs --encoder vits --random_init
  python run.py --input_video v.mp4 --checkpoint ckpt/video_depth_anything_vits.pth \
      --encoder vits --save_npz --save_stats
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Video Depth Anything (TPU-native)")
    p.add_argument("--input_video", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./outputs")
    p.add_argument("--encoder", type=str, default="vits", choices=["vits", "vitb", "vitl"])
    p.add_argument("--checkpoint", type=str, default=None,
                   help="torch .pth (auto-converted) or native Orbax dir; default ./checkpoints/video_depth_anything_<encoder>.pth")
    p.add_argument("--random_init", action="store_true",
                   help="seeded random weights (no checkpoint available)")
    p.add_argument("--input_size", type=int, default=518)
    p.add_argument("--max_res", type=int, default=1280)
    p.add_argument("--max_len", type=int, default=-1)
    p.add_argument("--target_fps", type=int, default=-1)
    p.add_argument("--fp32", action="store_true", help="fp32 end-to-end (default bf16 + fp32 islands)")
    p.add_argument("--fp32_island", action="store_true",
                   help="force the reference's fp32 output_conv2 island in bf16 mode "
                        "(bit-closer to the fp16 reference; ~25%% slower head)")
    p.add_argument("--skip_tmp_block", action="store_true", help="skip the third motion module")
    p.add_argument("--original", action="store_true",
                   help="reference-default sliding-window mode (no streaming flags)")
    # streaming single-frame mode (reference --process_single_image)
    p.add_argument("--process_single_image", action="store_true")
    p.add_argument("--inference_length", type=int, default=32)
    p.add_argument("--keyframe_list", type=int, nargs="+", default=[20],
                   help="streaming keyframe distances (reference run.py:37 default "
                        "[20]); lists containing 0 are incompatible with "
                        "--align_each_new_frame (unfilled-cache crash, also "
                        "latent in the reference)")
    p.add_argument("--align_each_new_frame", action="store_true")
    p.add_argument("--stream_chunk", type=int, default=8,
                   help="steady-state streaming frames batched per device "
                        "dispatch (1 disables chunking; clamped to "
                        "inference_length+max(keyframes)-3; with "
                        "--align_each_new_frame the chunk runs as a "
                        "fit-chained lax.scan)")
    p.add_argument("--transfer_dtype", choices=["fp32", "fp16"], default=None,
                   help="dtype of emitted depth maps for the device->host "
                        "copy (window + streaming modes); fp16 halves D2H "
                        "bytes at ~5e-4 relative quantization (alignment "
                        "fits and caches stay full precision; the window "
                        "stitch sees quantized inputs); env "
                        "VDA_TRANSFER_DTYPE")
    p.add_argument("--ring_dtype", choices=["fp32", "fp16", "bf16"],
                   default=None,
                   help="storage dtype of the device-resident emitted-depth "
                        "ring (--process_single_image --align_each_new_frame "
                        "only); fp16/bf16 halve ring memory, quantizing only "
                        "the (s, t) fit references — emitted depths stay "
                        "fp32; env VDA_RING_DTYPE")
    p.add_argument("--host_upsample", action="store_true",
                   default=None,
                   help="emit depth at MODEL resolution and run the final "
                        "align-corners upsample on the host (same fp32 taps "
                        "as the device path) — shrinks the dominant depth "
                        "D2H by the source/model area ratio (720p ≈ 1.9×, "
                        "4K ≈ 11×); window modes + plain streaming/KV modes "
                        "(aligned modes keep the device resize: their fits "
                        "consume output-res maps); composes with "
                        "--transfer_dtype fp16; env VDA_HOST_UPSAMPLE=1")
    p.add_argument("--window_batch", type=int, default=None,
                   help="sliding windows batched per device program "
                        "(windows are independent; default: 4 for "
                        "vits/vitb, 1 for vitl)")
    p.add_argument("--kv_cache", action="store_true",
                   help="with --process_single_image: KV-cache streaming "
                        "(O(1) work per frame; motion modules attend the new "
                        "frame over per-module K/V ring caches instead of "
                        "re-running the 32-frame window).  The working "
                        "equivalent of the reference's experimental "
                        "DPTHeadTemporalCrossAtt (dpt_temporal.py:263-343). "
                        "Combine with --align_each_new_frame for on-device "
                        "per-frame realignment against the pinned anchor "
                        "frame; --keyframe_list is ignored (the anchor is "
                        "the sole pinned reference in KV mode)")
    # outputs
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--save_npz", action="store_true")
    p.add_argument("--save_exr", action="store_true", help="save depth frames as EXR (requires OpenEXR-capable cv2)")
    p.add_argument("--save_tiff", action="store_true", help="save depths as a multi-page float32 TIFF stack")
    p.add_argument("--save_orig", action="store_true")
    p.add_argument("--save_vis", action="store_true")
    p.add_argument("--save_stats", action="store_true")
    p.add_argument("--shape_bucket", type=int, default=None,
                   help="snap model resolution to multiples of this (x14) to bound recompiles")
    # parallelism
    p.add_argument("--attn_impl", type=str, default="auto",
                   help="attention implementation: auto|xla|pallas, with an "
                        "optional :fast suffix (e.g. auto:fast) selecting the "
                        "no-max exp2 softmax in the Pallas kernel — exact "
                        "while attention logits stay inside fp32's exp2 "
                        "domain (±88; docs/PERFORMANCE.md)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard frame windows over all local devices")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel axis size: shard ViT qkv/proj/"
                        "fc1/fc2 and motion-FF weights Megatron-style over "
                        "N devices (windows shard over the remaining "
                        "devices; implies the mesh pipeline)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="pipeline-parallel stage count: stage the ViT "
                        "encoder's block chain over N devices (GPipe over "
                        "frame microbatches, ppermute hops over ICI); "
                        "sliding-window mode only, exclusive with "
                        "--data_parallel/--model_parallel")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="pipeline-parallel microbatch count (must divide "
                        "windows*32 frames per program; default: divisor "
                        "of that nearest 2*stages)")
    # multi-host (one process per host; sliding-window mode only)
    p.add_argument("--coordinator", type=str,
                   default=os.environ.get("VDA_COORDINATOR"),
                   help="multi-host: coordinator address host:port "
                        "(jax.distributed.initialize); env VDA_COORDINATOR")
    p.add_argument("--num_hosts", type=int,
                   default=int(os.environ.get("VDA_NUM_HOSTS", "0")) or None,
                   help="multi-host: total process count; env VDA_NUM_HOSTS. "
                        "Window spans are partitioned from the container's "
                        "frame-count header before any decode — for VFR or "
                        "estimated-header containers set "
                        "VDA_VALIDATE_FRAME_COUNT=1 (fail fast on bad "
                        "headers) and VDA_SEEK_MODE=grab (frame-exact "
                        "range seeks)")
    p.add_argument("--host_id", type=int,
                   default=(int(os.environ["VDA_HOST_ID"])
                            if "VDA_HOST_ID" in os.environ else None),
                   help="multi-host: this process's id; env VDA_HOST_ID")
    return p


def normalize_args(args):
    """Resolve flag interactions before inference.

    Reference semantics (run.py:43-44 help text): ``--original`` overrides
    the streaming flags and runs the plain sliding-window mode.  The
    reference's ``elif args.original`` branch (run.py:98-99) also calls
    infer_video_depth WITHOUT skip_tmp_block, so ``--original`` runs the
    unmodified model even if ``--skip_tmp_block`` was also passed.
    (Deliberate deviation from the reference *code*'s precedence — see
    docs/PARITY.md quirks section.)
    """
    if args.original:
        args.process_single_image = False
        args.skip_tmp_block = False
    return args


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.transfer_dtype is not None:
        # read at trace time by utils.device.transfer_cast; an explicit
        # --transfer_dtype fp32 overrides an inherited env fp16
        os.environ["VDA_TRANSFER_DTYPE"] = args.transfer_dtype

    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.io.video import read_video_frames, save_video
    from video_depth_anything_tpu.models.vda import VDAModel
    from video_depth_anything_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    multihost = args.coordinator is not None or (args.num_hosts or 1) > 1
    if multihost:
        if args.process_single_image:
            raise SystemExit(
                "--coordinator/--num_hosts is sliding-window only "
                "(windows shard across hosts; streaming is sequential)"
            )
        from video_depth_anything_tpu.parallel.multihost import (
            initialize_distributed,
        )

        host_id, n_hosts = initialize_distributed(
            args.coordinator, args.num_hosts, args.host_id
        )
        print(f"multi-host: process {host_id}/{n_hosts}")

    os.makedirs(args.output_dir, exist_ok=True)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    cfg = None
    if args.fp32_island and not args.fp32:
        import dataclasses

        from video_depth_anything_tpu.config import get_model_config

        cfg = dataclasses.replace(
            get_model_config(args.encoder), fp32_head_island=True
        )
    model = VDAModel(args.encoder, dtype=dtype, attn_impl=args.attn_impl, cfg=cfg)
    if args.random_init:
        model.init_params(jax.random.PRNGKey(0))
    else:
        ckpt = args.checkpoint or f"./checkpoints/video_depth_anything_{args.encoder}.pth"
        from video_depth_anything_tpu.io import checkpoint as ckpt_io

        if ckpt.endswith(".pth"):
            model.params = ckpt_io.load_torch_checkpoint(ckpt, model.cfg)
        else:
            model.params = ckpt_io.load_native(ckpt)

    normalize_args(args)

    if args.pipeline_parallel > 1:
        # PP covers the sliding-window mode only; reject (rather than
        # silently drop) every combination that would not stage anything
        if args.data_parallel or args.model_parallel > 1:
            raise SystemExit(
                "--pipeline_parallel is exclusive with "
                "--data_parallel/--model_parallel"
            )
        if args.process_single_image or multihost:
            raise SystemExit(
                "--pipeline_parallel applies to the sliding-window mode "
                "only (not --process_single_image/--kv_cache/--coordinator)"
            )

    if multihost:
        from video_depth_anything_tpu.io.video import (
            count_video_frames,
            read_video_frame_range,
        )
        from video_depth_anything_tpu.parallel.multihost import (
            MultiHostVideoDepthPipeline,
        )

        n_frames, fps = count_video_frames(
            args.input_video, args.max_len, args.target_fps
        )
        if args.target_fps > 0:
            fps = args.target_fps
        print(f"multi-host: {n_frames} sampled frames @ {fps:.2f} fps")
        pipe = MultiHostVideoDepthPipeline(
            model, input_size=args.input_size,
            shape_bucket=args.shape_bucket, window_batch=args.window_batch,
            data_parallel=args.data_parallel,
            model_parallel=args.model_parallel,
            host_upsample=args.host_upsample,
        )
        t0 = time.time()
        depths, fps = pipe.infer_video_depth(
            n_frames,
            lambda a, b: read_video_frame_range(
                args.input_video, a, b, args.target_fps, args.max_res
            ),
            fps,
            skip_tmp_block=args.skip_tmp_block,
            progress=True,
        )
        wall = time.time() - t0
        if host_id != 0:
            # every host holds the full stitched result; host 0 writes
            print(
                f"host {host_id}: {len(depths)} frames in {wall:.2f}s "
                "(outputs written by host 0)"
            )
            return 0
        frames = read_video_frame_range(
            args.input_video, 0, n_frames, args.target_fps, args.max_res
        ) if args.save_orig else np.zeros((0,) + depths.shape[1:] + (3,), np.uint8)
        return _save_outputs(args, frames, depths, fps, wall)

    frames, fps = read_video_frames(
        args.input_video, args.max_len, args.target_fps, args.max_res
    )
    print(f"decoded {len(frames)} frames @ {fps:.2f} fps, {frames.shape[2]}x{frames.shape[1]}")

    t0 = time.time()
    if args.process_single_image and args.kv_cache:
        from video_depth_anything_tpu.inference.kv_streaming import (
            KVStreamingPipeline,
        )

        pipe = KVStreamingPipeline(
            model,
            input_size=args.input_size,
            inference_length=args.inference_length,
            align_each_new_frame=args.align_each_new_frame,
            stream_chunk=args.stream_chunk,
            model_parallel=args.model_parallel,
            host_upsample=args.host_upsample,
        )
        depths, fps = pipe.infer(frames, fps, skip_tmp_block=args.skip_tmp_block, progress=True)
    elif args.process_single_image:
        from video_depth_anything_tpu.inference.streaming import StreamingDepthPipeline

        pipe = StreamingDepthPipeline(
            model,
            input_size=args.input_size,
            inference_length=args.inference_length,
            keyframe_list=tuple(args.keyframe_list),
            align_each_new_frame=args.align_each_new_frame,
            chunk_size=args.stream_chunk,
            model_parallel=args.model_parallel,
            ring_dtype=args.ring_dtype,
            host_upsample=args.host_upsample,
        )
        depths, fps = pipe.infer(frames, fps, skip_tmp_block=args.skip_tmp_block, progress=True)
    else:
        pipe = VideoDepthPipeline(
            model, input_size=args.input_size, shape_bucket=args.shape_bucket,
            window_batch=args.window_batch, host_upsample=args.host_upsample,
        )
        if args.pipeline_parallel > 1:
            from video_depth_anything_tpu.parallel.pipeline_parallel import (
                PipelineParallelVideoDepthPipeline,
            )

            pipe = PipelineParallelVideoDepthPipeline(
                model, pipeline_parallel=args.pipeline_parallel,
                num_microbatches=args.pp_microbatches,
                input_size=args.input_size, shape_bucket=args.shape_bucket,
                window_batch=args.window_batch,
                host_upsample=args.host_upsample,
            )
        elif args.data_parallel or args.model_parallel > 1:
            from video_depth_anything_tpu.parallel.data_parallel import (
                DataParallelVideoDepthPipeline,
            )

            pipe = DataParallelVideoDepthPipeline(
                model, input_size=args.input_size,
                shape_bucket=args.shape_bucket,
                model_parallel=args.model_parallel,
                window_batch=args.window_batch,
                host_upsample=args.host_upsample,
            )
        depths, fps = pipe.infer_video_depth(
            frames, fps, skip_tmp_block=args.skip_tmp_block, progress=True
        )
    wall = time.time() - t0
    return _save_outputs(args, frames, depths, fps, wall)


def _save_outputs(args, frames, depths, fps, wall) -> int:
    from video_depth_anything_tpu.io.video import save_video

    base = os.path.splitext(os.path.basename(args.input_video))[0]
    out_video = os.path.join(args.output_dir, f"{base}_depth.mp4")
    save_video(depths, out_video, fps=fps, is_depths=True, grayscale=args.grayscale)
    print(f"wrote {out_video}")

    if args.save_orig:
        save_video(frames, os.path.join(args.output_dir, f"{base}_orig.mp4"), fps=fps)
    if args.save_npz:
        np.savez_compressed(os.path.join(args.output_dir, f"{base}_depth.npz"), depth=depths)
    if args.save_tiff:
        from video_depth_anything_tpu.io.video import write_tiff_stack

        write_tiff_stack(os.path.join(args.output_dir, f"{base}_depths.tiff"), depths)
    if args.save_exr:
        import cv2

        exr_dir = os.path.join(args.output_dir, f"{base}_exr")
        os.makedirs(exr_dir, exist_ok=True)
        for i, d in enumerate(depths):
            cv2.imwrite(os.path.join(exr_dir, f"{i:05d}.exr"), d)
    if args.save_vis:
        from video_depth_anything_tpu.io.video import colorize_depth

        vis = colorize_depth(depths, spectral=True)
        save_video(vis, os.path.join(args.output_dir, f"{base}_vis.mp4"), fps=fps)

    if args.save_stats:
        from video_depth_anything_tpu.utils.stats import append_run_log

        append_run_log(
            os.path.join(args.output_dir, "inference_log.txt"),
            args=vars(args),
            n_frames=len(frames) or len(depths),
            n_depths=len(depths),
            wall_s=wall,
        )
    print(f"{len(depths)} frames in {wall:.2f}s = {len(depths)/wall:.2f} FPS end-to-end")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
