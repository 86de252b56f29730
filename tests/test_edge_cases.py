"""Edge-case sweep (round-3 verdict item 9).

Short videos through every inference mode, degenerate parallel layouts
(more hosts than windows, window batches larger than the window count),
and wide aspect ratios (> 1.78) through the bucketed-shape path.  The
reference guards some of these only at the eval layer (``eval.py:126``)
and crashes on others; every mode here must either produce one depth per
frame or the documented empty result.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_depth_anything_tpu.inference.kv_streaming import KVStreamingPipeline
from video_depth_anything_tpu.inference.pipeline import (
    VideoDepthPipeline,
    num_windows,
)
from video_depth_anything_tpu.inference.streaming import StreamingDepthPipeline
from video_depth_anything_tpu.models.vda import VDAModel


@pytest.fixture(scope="module")
def model():
    m = VDAModel("vits", dtype=jnp.float32)
    m.init_params(jax.random.PRNGKey(0))
    return m


def _frames(rng, n, h=36, w=44):
    return (rng.rand(n, h, w, 3) * 255).astype(np.uint8)


@pytest.mark.parametrize("n", [1, 3, 31])
def test_batch_pipeline_shorter_than_window(model, rng, n):
    """< INFER_LEN frames: tail-padding with last-frame copies
    (ref video_depth.py:351-354) must yield one window and one depth per
    original frame — including the 1-frame video."""
    frames = _frames(rng, n)
    depth, _ = VideoDepthPipeline(model, input_size=28).infer_video_depth(frames)
    assert depth.shape == (n, 36, 44)
    assert np.isfinite(depth).all()


def test_streaming_shorter_than_window_returns_empty(model, rng):
    """Feature-cache streaming predicts nothing before frame L−1 — the
    documented reference quirk (video_depth.py:237,321; eval guards at
    eval.py:126).  The pipeline must return an empty (0, H, W) stack, not
    crash."""
    frames = _frames(rng, 4)
    pipe = StreamingDepthPipeline(
        model, input_size=28, inference_length=6, keyframe_list=(2,)
    )
    depth, _ = pipe.infer(frames)
    assert depth.shape == (0, 36, 44)


def test_kv_streaming_single_frame(model, rng):
    """KV mode pads the warmup window, so even a 1-frame video produces
    its depth (unlike the feature-cache mode)."""
    frames = _frames(rng, 1)
    pipe = KVStreamingPipeline(model, input_size=28, inference_length=4)
    depth, _ = pipe.infer(frames)
    assert depth.shape == (1, 36, 44)


def test_kv_chunk_larger_than_video(model, rng):
    """stream_chunk larger than the post-warmup frame count: every frame
    falls to the per-frame path; nothing is dropped."""
    frames = _frames(rng, 6)
    pipe = KVStreamingPipeline(
        model, input_size=28, inference_length=4, stream_chunk=64
    )
    depth, _ = pipe.infer(frames)
    assert depth.shape == (6, 36, 44)


@pytest.mark.slow
def test_window_batch_exceeds_num_windows(model, rng):
    """window_batch > n_windows: the batch is padded with duplicates of
    the last window and the padding is dropped — output equals the
    serial pipeline exactly."""
    frames = _frames(rng, 40)  # 2 windows
    assert num_windows(40) == 2
    serial = VideoDepthPipeline(model, input_size=28, window_batch=1)
    want, _ = serial.infer_video_depth(frames)
    batched = VideoDepthPipeline(model, input_size=28, window_batch=8)
    got, _ = batched.infer_video_depth(frames)
    assert got.shape == want.shape == (40, 36, 44)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_more_hosts_than_windows_spans():
    """host_window_spans with n_hosts > n_windows: surplus hosts get
    empty spans (window_start == window_stop) and every window is owned
    exactly once."""
    from video_depth_anything_tpu.parallel.multihost import host_window_spans

    n_frames = 40  # 2 windows
    spans = host_window_spans(n_frames, 5)
    owned = []
    for s in spans:
        owned.extend(range(s.window_start, s.window_stop))
        if s.window_start == s.window_stop:
            assert s.frame_start == s.frame_stop == 0
    assert sorted(owned) == list(range(num_windows(n_frames)))


def test_multihost_pipeline_idle_host_single_process(model, rng):
    """MultiHostVideoDepthPipeline driven as 3 virtual hosts over a
    2-window video in ONE process (one host owns no windows): stitched
    output must equal the single pipeline bit-for-bit.  Exercises the
    idle host's shape-probe decode and the zero-padded allgather slots
    without spawning processes (the 2-proc e2e tests cover the real DCN
    path); ``process_allgather`` is simulated by collecting each virtual
    host's buffer."""
    from unittest import mock

    from jax.experimental import multihost_utils as mhu

    from video_depth_anything_tpu.parallel.multihost import (
        MultiHostVideoDepthPipeline,
    )

    frames = _frames(rng, 40)
    want, _ = VideoDepthPipeline(
        model, input_size=28, window_batch=1
    ).infer_video_depth(frames)

    def decode_range(a, b):
        return frames[a:b]

    # pass 1: capture what each virtual host contributes to the exchange
    contributions = []

    def capture(buf):
        contributions.append(np.asarray(buf))
        return np.stack([np.asarray(buf)] * 3)  # discarded

    for pid in range(3):
        pipe = MultiHostVideoDepthPipeline(
            model, input_size=28, window_batch=1,
            process_id=pid, num_processes=3,
        )
        with mock.patch.object(mhu, "process_allgather", capture):
            pipe.infer_video_depth(40, decode_range)
    assert len(contributions) == 3

    # pass 2: host 0 stitches the real gathered set
    pipe = MultiHostVideoDepthPipeline(
        model, input_size=28, window_batch=1, process_id=0, num_processes=3,
    )
    with mock.patch.object(
        mhu, "process_allgather", lambda buf: np.stack(contributions)
    ):
        got, _ = pipe.infer_video_depth(40, decode_range)
    assert got.shape == want.shape == (40, 36, 44)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
@pytest.mark.parametrize("hw", [(42, 126), (126, 42)])
def test_wide_aspect_ratio_shrink_and_bucket(model, rng, hw):
    """ratio > 1.78 rectangles: the reference's input-size shrink guard
    (video_depth.py:330-334) composes with bucketed model shapes — both
    pipelines produce one depth per frame at the source resolution."""
    h, w = hw
    frames = _frames(rng, 3, h, w)
    exact, _ = VideoDepthPipeline(model, input_size=56).infer_video_depth(frames)
    assert exact.shape == (3, h, w)
    bucketed, _ = VideoDepthPipeline(
        model, input_size=56, shape_bucket=28
    ).infer_video_depth(frames)
    assert bucketed.shape == (3, h, w)
    # bucketing snaps the model grid, so outputs differ slightly but must
    # stay correlated (same scene, same weights)
    c = np.corrcoef(exact.ravel(), bucketed.ravel())[0, 1]
    assert c > 0.9, c


@pytest.mark.slow
def test_kv_streaming_wide_aspect(model, rng):
    """KV mode through the ratio guard: non-square source, depth at the
    source resolution."""
    frames = _frames(rng, 6, 28, 84)
    pipe = KVStreamingPipeline(model, input_size=56, inference_length=4)
    depth, _ = pipe.infer(frames)
    assert depth.shape == (6, 28, 84)
    assert np.isfinite(depth).all()
