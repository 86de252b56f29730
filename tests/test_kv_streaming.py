"""End-to-end KV-cache streaming pipeline (inference/kv_streaming.py)."""

import dataclasses

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_depth_anything_tpu.inference.kv_streaming import KVStreamingPipeline
from video_depth_anything_tpu.models.vda import VDAModel


def _make_model(rng_key=0):
    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(jax.random.PRNGKey(rng_key))
    return model


def _frames(rng, n, h=36, w=44):
    return (rng.rand(n, h, w, 3) * 255).astype(np.uint8)


def test_kv_pipeline_identity_motion_matches_batch_window(rng):
    """At init the motion modules are identities (zero proj_out), so every
    frame's depth is a per-frame function — the KV pipeline (warmup window
    + kv steps) must match the batch forward frame-for-frame."""
    model = _make_model()
    frames = _frames(rng, 7)
    pipe = KVStreamingPipeline(model, input_size=28, inference_length=4)
    got, _ = pipe.infer(frames)
    assert got.shape == (7, 36, 44)

    # batch forward over all frames at the same preprocessing
    from video_depth_anything_tpu.utils.transform import preprocess_frames
    from video_depth_anything_tpu.ops.resize import bilinear_resize

    pre = preprocess_frames(frames, 28)
    d = model.infer_window(pre[None])  # (1, 7, h, w)
    d = np.asarray(
        bilinear_resize(
            jnp.asarray(d[0])[..., None].astype(jnp.float32), 36, 44
        )[..., 0]
    )
    np.testing.assert_allclose(got, d, rtol=1e-4, atol=1e-5)


def test_kv_pipeline_short_video_pads_warmup(rng):
    """Videos shorter than the window still produce one depth per frame
    (warmup pads with the last frame, the batch-mode tail quirk)."""
    model = _make_model()
    frames = _frames(rng, 3)
    pipe = KVStreamingPipeline(model, input_size=28, inference_length=4)
    got, _ = pipe.infer(frames)
    assert got.shape == (3, 36, 44)
    assert np.isfinite(got).all()


@pytest.mark.slow
def test_kv_pipeline_close_to_feature_cache_streaming(rng):
    """With non-trivial motion modules the KV mode is a different (frozen
    cached-context) computation from the feature-cache mode; outputs must
    stay close for smooth inputs — gross wiring errors (wrong slots, wrong
    cache order) blow this bound up."""
    from video_depth_anything_tpu.inference.streaming import (
        StreamingDepthPipeline,
    )

    model = _make_model()
    # randomize the (zero-init) proj_out kernels so motion modules act
    params = flax.core.unfreeze(model.params)
    prng = np.random.RandomState(7)
    for name in ("motion_0", "motion_1", "motion_2", "motion_3"):
        k = params["head"][name]["proj_out"]["kernel"]
        params["head"][name]["proj_out"]["kernel"] = 0.02 * jnp.asarray(
            prng.randn(*k.shape), jnp.float32
        )
    model.params = params

    # smooth, slowly varying frames (a drifting gradient)
    n, h, w = 12, 36, 44
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack(
        [
            np.stack([(xx + 2 * t) % w * 255 // w] * 3, axis=-1)
            for t in range(n)
        ]
    ).astype(np.uint8)

    L = 8
    kv = KVStreamingPipeline(model, input_size=28, inference_length=L)
    got, _ = kv.infer(frames)

    fc = StreamingDepthPipeline(
        model, input_size=28, inference_length=L, keyframe_list=(2,)
    )
    want, _ = fc.infer(frames)
    # feature-cache mode predicts nothing for the first L−1 frames
    assert want.shape[0] == n - (L - 1) and got.shape[0] == n
    got_tail = got[L - 1 :]
    denom = np.abs(want).mean() + 1e-8
    rel = np.abs(got_tail - want).mean() / denom
    assert rel < 0.1, rel
