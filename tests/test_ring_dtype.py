"""Reduced-precision device depth ring (``VDA_RING_DTYPE`` / ``--ring_dtype``).

The aligned feature-cache streaming mode keeps a device-resident ring of
emitted depths as (s, t) fit references (``inference/streaming.py``,
``_aligned_steady_fn``); fp32 it costs ~160 MB at 43 slots / 720p.  fp16 /
bf16 halve that: the cast sits at the ring WRITE only — reads upcast to
fp32 for the fit, and emitted depths are never quantized — so the output
deviation is bounded by the fit's sensitivity to quantized references.
A/B drift numbers: docs/PERFORMANCE.md, ``scripts/bench_ring_dtype.py``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video_depth_anything_tpu.inference.streaming import StreamingDepthPipeline
from video_depth_anything_tpu.models.vda import VDAModel


def _aligned_model():
    import flax
    import jax

    model = VDAModel("vits", dtype=jnp.float32)
    model.init_params(jax.random.PRNGKey(5))
    params = flax.core.unfreeze(model.params)
    prng = np.random.RandomState(9)
    for name in ("motion_0", "motion_1", "motion_2", "motion_3"):
        k = params["head"][name]["proj_out"]["kernel"]
        params["head"][name]["proj_out"]["kernel"] = 0.02 * jnp.asarray(
            prng.randn(*k.shape), jnp.float32
        )
    model.params = params
    return model


KWARGS = dict(
    input_size=28, inference_length=6, keyframe_list=(2,),
    align_each_new_frame=True,
)


@pytest.mark.slow
@pytest.mark.parametrize("ring", ["fp16", "bf16"])
def test_reduced_ring_matches_fp32_within_quantization(ring):
    model = _aligned_model()
    frames = (np.random.RandomState(31).rand(24, 36, 44, 3) * 255).astype(
        np.uint8
    )
    want, _ = StreamingDepthPipeline(model, **KWARGS).infer(frames)
    pipe = StreamingDepthPipeline(model, ring_dtype=ring, **KWARGS)
    assert pipe.ring_dtype == (jnp.float16 if ring == "fp16" else jnp.bfloat16)
    got, _ = pipe.infer(frames)
    assert got.shape == want.shape == (23, 36, 44)
    assert got.dtype == np.float32  # emitted depths stay full precision
    scale = np.abs(want).max() + 1e-6
    # half-precision fit references; the recursive chain compounds the
    # per-step quantization (~1e-3 for fp16's 10-bit mantissa, ~1e-2 for
    # bf16's 7-bit) but must stay a small relative deviation
    tol = 5e-3 if ring == "fp16" else 4e-2
    assert np.abs(got - want).max() / scale < tol


def test_ring_dtype_env_and_validation(monkeypatch):
    monkeypatch.setenv("VDA_RING_DTYPE", "bf16")
    model = VDAModel("vits", dtype=jnp.float32)
    pipe = StreamingDepthPipeline(model, **KWARGS)
    assert pipe.ring_dtype == jnp.bfloat16
    # explicit arg beats env
    pipe = StreamingDepthPipeline(model, ring_dtype="fp32", **KWARGS)
    assert pipe.ring_dtype == jnp.float32
    with pytest.raises(ValueError, match="ring_dtype"):
        StreamingDepthPipeline(model, ring_dtype="int8", **KWARGS)
