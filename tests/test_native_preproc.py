"""Native C++ preprocessing vs the cv2 reference path."""

import numpy as np
import pytest

from video_depth_anything_tpu.io.native_preproc import (
    available,
    gather_windows_native,
    preprocess_frames_native,
)
from video_depth_anything_tpu.utils.transform import preprocess_frames

needs_native = pytest.mark.skipif(not available(), reason="native lib not built")


@needs_native
def test_native_matches_cv2(rng):
    frames = (rng.rand(4, 120, 160, 3) * 255).astype(np.uint8)
    want = preprocess_frames(frames, 70)
    got = preprocess_frames_native(frames, 70)
    assert got.shape == want.shape
    # cv2 and the native path use the same float bicubic math; residual
    # differences come from SIMD accumulation order
    assert np.abs(got - want).max() < 2e-3


@needs_native
def test_native_gather_matches_fancy_indexing(rng):
    pre = rng.rand(6, 8, 9, 3).astype(np.float32)
    idx = np.array([[0, 5, 2, 2], [3, 3, 1, 0]], np.int64)
    got = gather_windows_native(pre, idx)
    np.testing.assert_array_equal(got, pre[idx])
