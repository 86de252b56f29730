"""End-to-end sliding-window pipeline parity vs the reference.

Runs the reference ``infer_video_depth`` (torch CPU, fp32) and this
framework's ``VideoDepthPipeline`` on the same synthetic uint8 video with
identical (converted) weights; the stitched full-video depth must agree.
Covers: preprocessing (cv2 resize + normalize), window assembly + keyframe
splice, model forward, final resize, and scale/shift stitching.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_oracle import load_reference_vda, reference_state_numpy
from video_depth_anything_tpu.config import INFER_LEN, KEYFRAMES, OVERLAP, get_model_config
from video_depth_anything_tpu.inference.pipeline import (
    VideoDepthPipeline,
    num_windows,
    padded_length,
    stitch_windows,
    window_frame_indices,
)
from video_depth_anything_tpu.io.checkpoint import convert_torch_state_dict
from video_depth_anything_tpu.models.vda import VDAModel

pytestmark = pytest.mark.slow  # torch-oracle / multi-process tier: excluded from the fast lane (pytest -m 'not slow')



def _synthetic_video(n=48, h=70, w=98, seed=0):
    """Smooth moving-gradient video (uint8) — content-like, not pure noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames = []
    for i in range(n):
        img = (
            127
            + 60 * np.sin(xx / 17.0 + i * 0.3)
            + 50 * np.cos(yy / 11.0 - i * 0.2)
        )
        img = np.stack([img, np.roll(img, i, axis=1), img[::-1]], axis=-1)
        img += rng.randn(h, w, 3) * 8
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames)


def test_window_indices_structure():
    idx = window_frame_indices(48)
    assert idx.shape == (num_windows(48), INFER_LEN)
    # window 0 is the identity range
    np.testing.assert_array_equal(idx[0], np.arange(32))
    # window 1's first OVERLAP slots are window 0's KEYFRAMES
    np.testing.assert_array_equal(idx[1, :OVERLAP], np.asarray(KEYFRAMES))
    np.testing.assert_array_equal(idx[1, OVERLAP:], np.arange(32, 54))
    # all indices stay within the padded frame array
    assert idx.max() < padded_length(48)


def test_stitch_single_window_is_identity(rng):
    d = [rng.rand(INFER_LEN, 8, 9).astype(np.float32)]
    out = stitch_windows(d, 20)
    np.testing.assert_array_equal(out, d[0][:20])


@pytest.mark.slow
def test_full_pipeline_parity():
    video = _synthetic_video()
    model_t = load_reference_vda("vits", seed=0)
    cfg = get_model_config("vits")
    params = convert_torch_state_dict(reference_state_numpy(model_t), cfg)

    with torch.no_grad():
        want, _ = model_t.infer_video_depth(
            video, target_fps=10, input_size=70, device="cpu", fp32=True
        )

    model = VDAModel("vits", params=params, dtype=jnp.float32)
    pipe = VideoDepthPipeline(model, input_size=70)
    got, _ = pipe.infer_video_depth(video, target_fps=10)

    assert got.shape == want.shape == video.shape[:3]
    scale = np.abs(want).mean() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=2e-3)


def test_shape_bucketing_bounds_shapes():
    from video_depth_anything_tpu.utils.transform import bucket_model_size, model_size_for

    shapes = set()
    exact = set()
    for h, w in [(360, 640), (368, 640), (376, 654), (480, 854), (486, 864)]:
        exact.add(model_size_for(h, w, 518))
        shapes.add(bucket_model_size(h, w, 518, 56))
    assert len(shapes) < len(exact)
    for bh, bw in shapes:
        assert bh % 14 == 0 and bw % 14 == 0


def test_pipeline_with_bucketing_runs(rng):
    import jax
    import jax.numpy as jnp

    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(jax.random.PRNGKey(0))
    video = (rng.rand(8, 50, 62, 3) * 255).astype(np.uint8)
    pipe = VideoDepthPipeline(model, input_size=56, shape_bucket=28)
    depth, _ = pipe.infer_video_depth(video)
    assert depth.shape == video.shape[:3]


def test_window_batching_matches_serial():
    """``window_batch`` processes independent index-resolved windows in one
    program — outputs must equal the serial loop's exactly, including the
    repeated-last-window padding of the ragged final chunk."""
    import jax

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(jax.random.PRNGKey(5))
    video = _synthetic_video(n=70, h=64, w=80, seed=9)

    serial = VideoDepthPipeline(model, input_size=56, window_batch=1)
    want, _ = serial.infer_video_depth(video)
    batched = VideoDepthPipeline(model, input_size=56, window_batch=3)
    got, _ = batched.infer_video_depth(video)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fp16_transfer_window_mode_quantizes_only(monkeypatch):
    """``VDA_TRANSFER_DTYPE=fp16`` on the sliding-window pipeline: halves
    the per-window D2H; stitched output must equal the fp32-transfer path
    up to fp16 quantization (the host stitch converts back to fp32, so
    its fits see ~5e-4 relative noise at most)."""
    import jax

    from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
    from video_depth_anything_tpu.models.vda import VDAModel

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(jax.random.PRNGKey(6))
    rng = np.random.RandomState(8)
    frames = (rng.rand(40, 36, 44, 3) * 255).astype(np.uint8)

    want, _ = VideoDepthPipeline(model, input_size=28).infer_video_depth(frames)
    monkeypatch.setenv("VDA_TRANSFER_DTYPE", "fp16")
    got, _ = VideoDepthPipeline(model, input_size=28).infer_video_depth(frames)
    assert got.shape == want.shape == (40, 36, 44) and got.dtype == np.float32
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 5e-3
