"""CLI argument-surface tests (flag parity with reference run.py:29-58)."""

import numpy as np
import pytest

import run as run_cli


def test_run_flags_present():
    p = run_cli.build_parser()
    args = p.parse_args(
        [
            "--input_video", "v.mp4", "--encoder", "vitl", "--input_size", "392",
            "--max_res", "960", "--max_len", "100", "--target_fps", "12",
            "--fp32", "--skip_tmp_block", "--original", "--grayscale",
            "--save_npz", "--save_tiff", "--save_orig", "--save_vis", "--save_stats",
            "--process_single_image", "--inference_length", "16",
            "--keyframe_list", "3", "7", "--align_each_new_frame",
            "--data_parallel", "--pipeline_parallel", "2",
        ]
    )
    assert args.encoder == "vitl"
    assert args.keyframe_list == [3, 7]
    assert args.fp32 and args.save_npz and args.align_each_new_frame
    assert args.pipeline_parallel == 2


def test_eval_streaming_flags_present():
    # reference eval.py:33-44 exposes the streaming/ablation knobs
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "eval_cli", os.path.join(os.path.dirname(__file__), "..", "eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(SystemExit):  # --csv/--root/--dataset required
        mod.main([
            "--dataset", "kitti", "--streaming", "--inference_length", "16",
            "--keyframe_list", "3", "7", "--align_each_new_frame",
            "--skip_tmp_block", "--original",
        ])


def test_tiff_stack_roundtrip_bit_exact(tmp_path):
    # reference --save_tiff writes float stacks consumed by its comparative
    # pipeline (run.py:165-166, calculate_metrics.py:141-163)
    from video_depth_anything_tpu.io.video import read_tiff_stack, write_tiff_stack

    rng = np.random.default_rng(0)
    depths = rng.standard_normal((5, 17, 23)).astype(np.float32) * 100
    path = str(tmp_path / "d_depths.tiff")
    write_tiff_stack(path, depths)
    back = read_tiff_stack(path)
    assert back.dtype == np.float32 and np.array_equal(back, depths)


def test_original_overrides_skip_tmp_block_and_streaming():
    # reference run.py:98-99: the --original branch calls infer_video_depth
    # without skip_tmp_block; --original also overrides --process_single_image
    p = run_cli.build_parser()
    args = p.parse_args(
        ["--input_video", "v.mp4", "--original", "--skip_tmp_block",
         "--process_single_image"]
    )
    run_cli.normalize_args(args)
    assert not args.skip_tmp_block and not args.process_single_image

    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "eval_cli_norm", os.path.join(os.path.dirname(__file__), "..", "eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class A:
        original = True
        streaming = True
        skip_tmp_block = True

    a = mod.normalize_args(A())
    assert not a.streaming and not a.skip_tmp_block


def test_default_keyframe_list_is_align_compatible():
    # advisor finding: the old [0, 12] default + --align_each_new_frame
    # crashed in the StreamingDepthPipeline constructor guard
    args = run_cli.build_parser().parse_args(["--input_video", "v.mp4"])
    assert args.keyframe_list == [20]  # reference run.py:37 default
    # the default schedule must not trip the align guard: every slot of the
    # first-prediction gather stays inside the L-1 cached frames
    from video_depth_anything_tpu.inference.streaming import streaming_schedule

    _, use_idx, _ = streaming_schedule(32, args.keyframe_list)
    assert max(use_idx[0]) <= 30  # inside the L-1 cached frames


def test_tiff_stack_rejects_empty():
    from video_depth_anything_tpu.io.video import write_tiff_stack

    with pytest.raises(ValueError, match="empty"):
        write_tiff_stack("/tmp/never_written.tiff", np.zeros((0, 4, 4), np.float32))


def test_run_requires_input_video(capsys):
    with pytest.raises(SystemExit):
        run_cli.build_parser().parse_args([])


def test_eval_cli_rejects_unknown_dataset():
    # load the repo-root eval.py explicitly (the reference mount also has an
    # eval.py and may be on sys.path from the oracle)
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "vda_eval_cli", os.path.join(os.path.dirname(__file__), "..", "eval.py")
    )
    eval_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(eval_cli)

    with pytest.raises(SystemExit):
        eval_cli.main(["--dataset", "nope", "--root", "/tmp", "--csv", "/tmp/x.csv"])


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    """Full train.py loop on a synthesized TartanAir mini-dataset: sampler →
    prefetcher → pjit'd steps → checkpoint save, then --resume continues
    from the saved step."""
    import json
    import os

    import cv2
    import numpy as np

    import train as train_cli

    root = str(tmp_path / "ta")
    scene = os.path.join(root, "abandonedfactory", "Easy", "P001")
    os.makedirs(os.path.join(scene, "depth_left"))
    os.makedirs(os.path.join(scene, "image_left"))
    rng = np.random.RandomState(0)
    for i in range(6):
        cv2.imwrite(
            os.path.join(scene, "image_left", f"{i:06d}_left.png"),
            (rng.rand(20, 24, 3) * 255).astype(np.uint8),
        )
        np.save(
            os.path.join(scene, "depth_left", f"{i:06d}_left_depth.npy"),
            (rng.rand(20, 24) * 10 + 1).astype(np.float32),
        )
    poses = np.zeros((6, 7))
    poses[:, 6] = 1.0
    np.savetxt(os.path.join(scene, "pose_left.txt"), poses)

    out = str(tmp_path / "ckpt")
    args = [
        "--dataset", "tartanair", "--root", root, "--encoder", "vits",
        "--steps", "2", "--clip_len", "2", "--input_size", "28",
        "--save_every", "2", "--log_every", "1", "--out", out,
        "--eval_every", "2", "--eval_clips", "1",
    ]
    assert train_cli.main(args) == 0
    assert os.path.isdir(os.path.join(out, "state_latest"))
    # the validation hook ran at step 2 and landed in the stats file
    with open(os.path.join(out, "train_log.jsonl")) as fh:
        lines = [json.loads(l) for l in fh]
    val = [l for l in lines if "val_absrel_disp" in l]
    assert val and val[0]["step"] == 2
    assert 0 <= val[0]["val_delta1_disp"] <= 1

    # resume picks up at step 2 and runs to 3 (argparse last-wins --steps)
    assert train_cli.main(args + ["--steps", "3", "--resume"]) == 0
