"""Streaming single-frame mode parity vs the reference.

Runs the reference ``infere_single_image`` (torch CPU, fp32) and this
framework's ``StreamingDepthPipeline`` on the same video with converted
weights, for both alignment modes, with a reduced inference length to keep
the torch oracle cheap.  Covers: warmup caching, keyframe gather schedule,
streaming head forward, cache shifting, and per-frame re-alignment.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_oracle import load_reference_vda, reference_state_numpy
from tests.test_pipeline_parity import _synthetic_video
from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.inference.streaming import (
    StreamingDepthPipeline,
    streaming_schedule,
)
from video_depth_anything_tpu.io.checkpoint import convert_torch_state_dict
from video_depth_anything_tpu.models.vda import VDAModel

pytestmark = pytest.mark.slow  # torch-oracle / multi-process tier: excluded from the fast lane (pytest -m 'not slow')



def test_schedule_default_config():
    static_kf, use_idx, align_idx = streaming_schedule(32, [0, 12])
    assert static_kf == [32, 20]
    assert len(use_idx) == 13  # frames 31 .. 43
    for lst in use_idx:
        assert len(lst) == 31
        assert lst[0] == 0  # anchor frame pinned
    # steady-state schedule must keep indices inside the cache
    assert max(use_idx[-1]) < 32 + 12 - 1


@pytest.fixture(scope="module")
def oracle():
    model_t = load_reference_vda("vits", seed=0)
    cfg = get_model_config("vits")
    params = convert_torch_state_dict(reference_state_numpy(model_t), cfg)
    return model_t, params


@pytest.mark.slow
@pytest.mark.parametrize(
    "align,keyframes",
    [
        (False, (0, 4)),
        # align mode: keyframe 0 configs crash in the reference (IndexError
        # at dpt_temporal.py:189) — only nonzero keyframes are valid there.
        (True, (4,)),
    ],
)
def test_streaming_parity(oracle, align, keyframes):
    model_t, params = oracle
    video = _synthetic_video(n=20, h=70, w=70, seed=2)

    with torch.no_grad():
        want, _ = model_t.infere_single_image(
            video,
            target_fps=10,
            input_size=70,
            device="cpu",
            fp32=True,
            inference_length=8,
            keyframe_list=list(keyframes),
            align_each_new_frame=align,
        )

    model = VDAModel("vits", params=params, dtype=jnp.float32)
    pipe = StreamingDepthPipeline(
        model,
        input_size=70,
        inference_length=8,
        keyframe_list=keyframes,
        align_each_new_frame=align,
    )
    got, _ = pipe.infer(video, 10)

    assert got.shape == want.shape
    scale = np.abs(want).mean() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, rtol=0, atol=2e-3)


def test_streaming_align_rejects_zero_keyframe():
    model = VDAModel("vits", dtype=jnp.float32)
    with pytest.raises(ValueError, match="unfilled cache slots"):
        StreamingDepthPipeline(
            model,
            inference_length=8,
            keyframe_list=(0, 4),
            align_each_new_frame=True,
        )


def test_chunked_steady_state_matches_per_frame(rng):
    """The chunked steady-state program (K frames per dispatch, batched
    encoder + batched K-window head + slot scatter) is exactly the math of
    K per-frame steps — the feature cache holds pre-motion per-frame
    features, so consecutive non-align steps have no sequential dependency.
    Covers the in-chunk gather redirects (a frame attending slots rewritten
    earlier in the same chunk) and the per-frame tail fallback."""
    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(__import__("jax").random.PRNGKey(3))
    frames = (rng.rand(26, 36, 44, 3) * 255).astype(np.uint8)
    kwargs = dict(input_size=28, inference_length=6, keyframe_list=(2,))

    ref_pipe = StreamingDepthPipeline(model, chunk_size=1, **kwargs)
    want, _ = ref_pipe.infer(frames)
    chunk_pipe = StreamingDepthPipeline(model, chunk_size=5, **kwargs)
    got, _ = chunk_pipe.infer(frames)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_device_align_matches_host_fit(monkeypatch):
    """The steady-state aligned step with the (s, t) fit ON DEVICE
    (``_aligned_steady_fn`` + the emitted-depth ring) must reproduce the
    host-fit chain (``VDA_DEVICE_ALIGN=0``) — same math: the ring holds
    exactly ``depth_list[abs_pred_idx]`` by the slot-mirroring
    construction.  Long enough video that the steady phase (frame
    L+max_kf on) dominates; motion proj_out randomized so the cache and
    the alignment are both load-bearing.

    Uses its OWN seeded rng (not the shared session fixture): the jax vs
    numpy fits differ by fp32 reduction order (~1e-6 in s, t) and the
    aligned chain feeds emitted depths into later fits, so the compounded
    deviation over the 16 steady frames is input-dependent — the shared
    rng's stream shifts whenever tests are added elsewhere."""
    import flax

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(__import__("jax").random.PRNGKey(5))
    params = flax.core.unfreeze(model.params)
    prng = np.random.RandomState(9)
    for name in ("motion_0", "motion_1", "motion_2", "motion_3"):
        k = params["head"][name]["proj_out"]["kernel"]
        params["head"][name]["proj_out"]["kernel"] = 0.02 * jnp.asarray(
            prng.randn(*k.shape), jnp.float32
        )
    model.params = params

    frng = np.random.RandomState(31)
    frames = (frng.rand(24, 36, 44, 3) * 255).astype(np.uint8)
    kwargs = dict(
        input_size=28, inference_length=6, keyframe_list=(2,),
        align_each_new_frame=True,
    )
    # steady_from = L + max_kf = 8 → frames 8..23 take the steady path
    monkeypatch.setenv("VDA_DEVICE_ALIGN", "0")
    want, _ = StreamingDepthPipeline(model, **kwargs).infer(frames)
    monkeypatch.delenv("VDA_DEVICE_ALIGN")
    got, _ = StreamingDepthPipeline(model, **kwargs).infer(frames)

    assert got.shape == want.shape == (23, 36, 44)
    # tolerance covers the compounded reduction-order drift of the
    # recursive fit chain, not a semantic gap
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-4)


def test_aligned_chunk_matches_per_frame():
    """Chunked ALIGNED steady state (lax.scan over the cache + emitted-
    depth ring, K frames per dispatch) must equal the per-frame aligned
    device path — the scan threads each step's emitted depth into the
    next step's fit exactly like the sequential loop.  Also covers the
    per-frame tail fallback (frame count not a multiple of the chunk).

    Own seeded rng + compounding-aware tolerance: the chunked path
    batches the encoder over K frames, whose fp32 reductions are not
    bit-identical to K single-frame encodes, and the aligned chain feeds
    emitted depths into later fits — input-dependent compounding, same
    rationale as test_device_align_matches_host_fit."""
    import flax

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(__import__("jax").random.PRNGKey(5))
    params = flax.core.unfreeze(model.params)
    prng = np.random.RandomState(9)
    for name in ("motion_0", "motion_1", "motion_2", "motion_3"):
        k = params["head"][name]["proj_out"]["kernel"]
        params["head"][name]["proj_out"]["kernel"] = 0.02 * jnp.asarray(
            prng.randn(*k.shape), jnp.float32
        )
    model.params = params

    frng = np.random.RandomState(33)
    frames = (frng.rand(23, 36, 44, 3) * 255).astype(np.uint8)
    kwargs = dict(
        input_size=28, inference_length=6, keyframe_list=(2,),
        align_each_new_frame=True,
    )
    want, _ = StreamingDepthPipeline(model, chunk_size=1, **kwargs).infer(frames)
    got, _ = StreamingDepthPipeline(model, chunk_size=4, **kwargs).infer(frames)
    assert got.shape == want.shape == (22, 36, 44)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-4)


def test_chunk_clamped_to_unique_write_slots():
    """chunk_size > cache_len−2 must be clamped: past that bound the freed
    physical slots repeat within one chunk and ``cache.at[slots].set`` with
    duplicate indices has an unspecified winner in XLA (silent feature-cache
    corruption).  Pipeline construction clamps; the steady index tables stay
    duplicate-free at the clamped size."""
    model = VDAModel("vits", dtype=jnp.float32)
    # L=6, keyframes=(0,2) → cache_len = 6+2−1 = 7 → max safe chunk 5
    pipe = StreamingDepthPipeline(
        model, inference_length=6, keyframe_list=(0, 2), chunk_size=8
    )
    assert pipe.chunk == pipe.cache_len - 2 == 5
    phys = list(range(pipe.cache_len))
    _, slots, _ = pipe._steady_indices(phys, pipe.chunk)
    assert len(set(slots.tolist())) == len(slots)


def test_fp16_transfer_feature_cache_aligned(rng, monkeypatch):
    """fp16 transfer on the feature-cache ALIGNED paths (device fit,
    per-frame + chunked): the emitted-depth ring and every fit stay fp32 —
    outputs equal the fp32-transfer path up to a single fp16 cast."""
    import flax

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(__import__("jax").random.PRNGKey(5))
    params = flax.core.unfreeze(model.params)
    prng = np.random.RandomState(9)
    for name in ("motion_0", "motion_1", "motion_2", "motion_3"):
        k = params["head"][name]["proj_out"]["kernel"]
        params["head"][name]["proj_out"]["kernel"] = 0.02 * jnp.asarray(
            prng.randn(*k.shape), jnp.float32
        )
    model.params = params

    frames = (rng.rand(20, 36, 44, 3) * 255).astype(np.uint8)
    kwargs = dict(
        input_size=28, inference_length=6, keyframe_list=(2,),
        align_each_new_frame=True, chunk_size=4,
    )
    want, _ = StreamingDepthPipeline(model, **kwargs).infer(frames)
    monkeypatch.setenv("VDA_TRANSFER_DTYPE", "fp16")
    got, _ = StreamingDepthPipeline(model, **kwargs).infer(frames)
    assert got.shape == want.shape and got.dtype == np.float32
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 2e-3
