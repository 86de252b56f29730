"""Native C++ video decoder vs the cv2 fallback: identical pixels, fps,
striding, and sampled-frame-limit semantics (both sit on ffmpeg/swscale,
so the comparison is bit-exact)."""

import os

import numpy as np
import pytest

VIDEO = "/root/reference/assets/example_videos/davis_rollercoaster.mp4"


def _native(*args):
    from video_depth_anything_tpu.io.native_video import (
        read_video_frames_native,
    )

    return read_video_frames_native(*args)


def _cv2(*args):
    from video_depth_anything_tpu.io.video import read_video_frames

    old = os.environ.get("VDA_NATIVE_DECODE")
    os.environ["VDA_NATIVE_DECODE"] = "0"
    try:
        return read_video_frames(*args)
    finally:
        if old is None:
            del os.environ["VDA_NATIVE_DECODE"]
        else:
            os.environ["VDA_NATIVE_DECODE"] = old


pytestmark = pytest.mark.skipif(
    not os.path.exists(VIDEO), reason="reference example video unavailable"
)


@pytest.mark.parametrize(
    "process_length,target_fps,max_res",
    [
        (12, -1, -1),       # plain decode
        (8, 10, -1),        # fps striding
        (6, -1, 400),       # max_res downscale (python cv2.resize both paths)
        (5, 8, 320),        # both
    ],
)
def test_native_decode_matches_cv2(process_length, target_fps, max_res):
    out = _native(VIDEO, process_length, target_fps, max_res)
    if out is None:
        pytest.skip("native decoder unavailable (libav not present)")
    nat, fps_nat = out
    ref, fps_ref = _cv2(VIDEO, process_length, target_fps, max_res)
    assert fps_nat == fps_ref
    assert nat.shape == ref.shape
    np.testing.assert_array_equal(nat, ref)
