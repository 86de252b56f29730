#!/usr/bin/env python
"""Comparative evaluation pipeline (capability of reference
``calculate_metrics.py:32-265``): run inference (optionally as ``run.py``
subprocesses) for several method configurations over a video, first-frame
align all methods to a common reference, compute Abs/MSE metrics, and
render side-by-side comparison videos.

  # compare precomputed outputs
  python compare.py --video v.mp4 --method base=out/base_depth.npz \
      --method stream=out/stream_depth.npz --out_dir cmp/

  # let compare.py drive run.py itself
  python compare.py --video v.mp4 --run "base:--random_init" \
      --run "skip:--random_init --skip_tmp_block" --out_dir cmp/
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np


def _load_depth_npz(path: str) -> np.ndarray:
    """Load a depth stack from .npz or a multi-page .tiff (the reference's
    comparative pipeline consumes TIFF stacks, ``calculate_metrics.py:141-163``)."""
    if path.endswith((".tiff", ".tif")):
        from video_depth_anything_tpu.io.video import read_tiff_stack

        return read_tiff_stack(path)
    data = np.load(path)
    key = "depth" if "depth" in data else list(data.keys())[0]
    return data[key]


def first_frame_align(pred: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Scale/shift-fit frame 0 of ``pred`` to frame 0 of ``ref``, apply to
    the whole stack (ref ``calculate_metrics.py:174-204``)."""
    from video_depth_anything_tpu.ops.scale_shift import compute_scale_and_shift

    s, t = compute_scale_and_shift(pred[0], ref[0])
    return pred * s + t


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="comparative depth evaluation")
    p.add_argument("--video", required=True)
    p.add_argument("--method", action="append", default=[],
                   help="name=path_to_depth.npz (repeatable)")
    p.add_argument("--run", action="append", default=[],
                   help='name:"run.py flags" — runs run.py as a subprocess')
    p.add_argument("--gt_npz", default=None, help="optional ground-truth depth npz")
    p.add_argument("--out_dir", default="./compare_out")
    p.add_argument("--fps", type=float, default=10)
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    methods = {}
    for spec in args.method:
        name, path = spec.split("=", 1)
        methods[name] = _load_depth_npz(path)

    base = os.path.splitext(os.path.basename(args.video))[0]
    for spec in args.run:
        name, flags = spec.split(":", 1)
        out_dir = os.path.join(args.out_dir, f"run_{name}")
        cmd = [
            sys.executable, "run.py", "--input_video", args.video,
            "--output_dir", out_dir, "--save_npz", *flags.split(),
        ]
        print("running:", " ".join(cmd))
        subprocess.run(cmd, check=True)
        methods[name] = _load_depth_npz(os.path.join(out_dir, f"{base}_depth.npz"))

    if not methods:
        p.error("no methods given (--method or --run)")

    from video_depth_anything_tpu.evals.metrics import abs_diff, mse
    from video_depth_anything_tpu.evals.visualize import (
        render_comparison_video,
        render_money_plot,
    )
    from video_depth_anything_tpu.io.video import read_video_frames

    rgb, fps = read_video_frames(args.video, max_res=640)
    if args.fps > 0:
        fps = args.fps

    gt = _load_depth_npz(args.gt_npz) if args.gt_npz else None
    ref_name = next(iter(methods))
    ref = gt if gt is not None else methods[ref_name]

    aligned, rows = {}, {}
    for name, pred in methods.items():
        n = min(len(pred), len(ref))
        # a method with fewer frames (e.g. streaming) outputs the video's
        # LAST n frames — align and score against the reference tail so the
        # frame pairing is temporally consistent
        ref_n = ref[len(ref) - n :]
        a = first_frame_align(pred[len(pred) - n :], ref_n)
        aligned[name] = a
        rows[name] = {
            "frames": int(n),
            "abs_vs_ref": abs_diff(a, ref_n),
            "mse_vs_ref": mse(a, ref_n),
        }

    report = os.path.join(args.out_dir, "comparison.json")
    with open(report, "w") as f:
        json.dump({"reference": "gt" if gt is not None else ref_name, "methods": rows}, f, indent=2)
    print(json.dumps(rows, indent=2))

    # render the common TAIL so panels of different-length methods show the
    # same video moments side by side
    n = min(len(rgb), *(len(a) for a in aligned.values()))
    tail = lambda x: x[len(x) - n :]
    render_money_plot(
        tail(rgb),
        {k: tail(v) for k, v in aligned.items()},
        os.path.join(args.out_dir, f"{base}_money.mp4"),
        fps=fps,
        max_frames=args.max_frames,
    )
    render_comparison_video(
        tail(rgb),
        tail(gt) if gt is not None else None,
        {k: tail(v) for k, v in aligned.items()},
        os.path.join(args.out_dir, f"{base}_compare.mp4"),
        fps=fps,
        max_frames=args.max_frames,
    )
    print(f"wrote {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
