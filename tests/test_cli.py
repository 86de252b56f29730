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
            "--save_npz", "--save_orig", "--save_vis", "--save_stats",
            "--process_single_image", "--inference_length", "16",
            "--keyframe_list", "3", "7", "--align_each_new_frame",
            "--data_parallel",
        ]
    )
    assert args.encoder == "vitl"
    assert args.keyframe_list == [3, 7]
    assert args.fp32 and args.save_npz and args.align_each_new_frame


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
