"""Host-side final upsample (``host_upsample`` / ``VDA_HOST_UPSAMPLE``).

The window pipelines can emit depth at MODEL resolution and run the final
align-corners bilinear to source resolution on the host
(``ops.resize.bilinear_resize_np`` — the gather-lerp twin of the device
GEMM formulation, same fp32 taps/weights/pass order).  Shrinks the
dominant depth D2H by the source/model area ratio; semantics are
preserved because the stitch already runs on host over full-resolution
maps — only where the upsample executes moves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_depth_anything_tpu.inference.pipeline import VideoDepthPipeline
from video_depth_anything_tpu.models.vda import VDAModel
from video_depth_anything_tpu.ops.resize import (
    bilinear_resize,
    bilinear_resize_np,
)


@pytest.fixture(scope="module")
def small_model():
    m = VDAModel("vits", dtype=jnp.float32)
    m.init_params(jax.random.PRNGKey(0))
    return m


@pytest.mark.parametrize(
    "shape,out_hw",
    [
        ((2, 3, 20, 26), (36, 44)),   # upsample, batch dims
        ((5, 12, 16), (7, 9)),        # downsample
        ((1, 8, 8), (8, 8)),          # identity
        ((4, 1, 13), (6, 1)),         # degenerate axes (out_size == 1)
    ],
)
def test_np_twin_matches_device_resize(shape, out_hw, rng):
    x = rng.randn(*shape).astype(np.float32) * 10
    want = np.asarray(
        bilinear_resize(jnp.asarray(x)[..., None], *out_hw)[..., 0]
    )
    got = bilinear_resize_np(x, *out_hw)
    assert got.shape == want.shape
    # identical taps + fp32 weights; only the (zero-contribution) GEMM
    # accumulation order differs
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_window_pipeline_host_upsample_matches_device(small_model):
    video = (np.random.RandomState(11).rand(50, 64, 80, 3) * 255).astype(
        np.uint8
    )
    want, _ = VideoDepthPipeline(
        small_model, input_size=56, host_upsample=False
    ).infer_video_depth(video)
    got, _ = VideoDepthPipeline(
        small_model, input_size=56, host_upsample=True
    ).infer_video_depth(video)
    assert got.shape == want.shape == (50, 64, 80)
    # fp32 round-off only (the stitch sees ~1e-7-relative different inputs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dp_pipeline_host_upsample_matches_device(small_model):
    from video_depth_anything_tpu.parallel.data_parallel import (
        DataParallelVideoDepthPipeline,
    )

    video = (np.random.RandomState(12).rand(40, 36, 44, 3) * 255).astype(
        np.uint8
    )
    want, _ = DataParallelVideoDepthPipeline(
        small_model, input_size=28
    ).infer_video_depth(video)
    got, _ = DataParallelVideoDepthPipeline(
        small_model, input_size=28, host_upsample=True
    ).infer_video_depth(video)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_env_default(small_model, monkeypatch):
    monkeypatch.setenv("VDA_HOST_UPSAMPLE", "1")
    assert VideoDepthPipeline(small_model).host_upsample is True
    # explicit arg beats env
    assert (
        VideoDepthPipeline(small_model, host_upsample=False).host_upsample
        is False
    )


@pytest.mark.slow
def test_kv_streaming_host_upsample_matches_device(small_model):
    from video_depth_anything_tpu.inference.kv_streaming import (
        KVStreamingPipeline,
    )

    video = (np.random.RandomState(13).rand(12, 36, 44, 3) * 255).astype(
        np.uint8
    )
    kwargs = dict(input_size=28, inference_length=4, stream_chunk=3)
    want, _ = KVStreamingPipeline(small_model, **kwargs).infer(video)
    got, _ = KVStreamingPipeline(
        small_model, host_upsample=True, **kwargs
    ).infer(video)
    assert got.shape == want.shape == (12, 36, 44)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_feature_cache_streaming_host_upsample_matches_device(small_model):
    from video_depth_anything_tpu.inference.streaming import (
        StreamingDepthPipeline,
    )

    video = (np.random.RandomState(14).rand(16, 36, 44, 3) * 255).astype(
        np.uint8
    )
    kwargs = dict(input_size=28, inference_length=6, keyframe_list=(2,),
                  chunk_size=4)
    want, _ = StreamingDepthPipeline(small_model, **kwargs).infer(video)
    got, _ = StreamingDepthPipeline(
        small_model, host_upsample=True, **kwargs
    ).infer(video)
    assert got.shape == want.shape == (11, 36, 44)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_aligned_modes_force_host_upsample_off(small_model):
    """The aligned modes' (s, t) fits consume output-resolution maps
    (reference semantics) — host_upsample silently disables there."""
    from video_depth_anything_tpu.inference.kv_streaming import (
        KVStreamingPipeline,
    )
    from video_depth_anything_tpu.inference.streaming import (
        StreamingDepthPipeline,
    )

    kv = KVStreamingPipeline(
        small_model, inference_length=4, align_each_new_frame=True,
        host_upsample=True,
    )
    assert kv.host_upsample is False
    fc = StreamingDepthPipeline(
        small_model, inference_length=6, keyframe_list=(2,),
        align_each_new_frame=True, host_upsample=True,
    )
    assert fc.host_upsample is False
