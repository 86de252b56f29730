"""Weight-exact parity of the JAX model against the PyTorch reference.

The torch reference (read-only, /root/reference) is run with seeded random
weights; the checkpoint converter maps those exact weights onto the JAX
model; outputs must agree in fp32.  This is the oracle SURVEY.md §7 stage 1
calls for (no released checkpoints are downloadable here, so random weights
stand in — the mapping is identical).
"""

import numpy as np
import pytest
import torch

from tests.reference_oracle import load_reference_vda, reference_state_numpy
from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.io.checkpoint import convert_torch_state_dict
from video_depth_anything_tpu.models import VideoDepthAnything

import jax.numpy as jnp
import jax

pytestmark = pytest.mark.slow  # torch-oracle / multi-process tier: excluded from the fast lane (pytest -m 'not slow')



@pytest.fixture(scope="module")
def oracle():
    model = load_reference_vda("vits", seed=0)
    state = reference_state_numpy(model)
    cfg = get_model_config("vits")
    params = convert_torch_state_dict(state, cfg)
    return model, cfg, params


def _run_both(oracle, x_btchw: np.ndarray, skip_tmp_block: bool = False):
    model, cfg, params = oracle
    with torch.no_grad():
        want = model.forward(torch.from_numpy(x_btchw), skip_tmp_block).numpy()
    x_nhwc = np.transpose(x_btchw, (0, 1, 3, 4, 2))
    module = VideoDepthAnything(cfg)
    got = np.asarray(
        jax.jit(module.apply, static_argnames=("skip_tmp_block",))(
            {"params": params},
            jnp.asarray(x_nhwc),
            skip_tmp_block=skip_tmp_block,
        )
    )
    return got, want


def test_converter_strictness(oracle):
    model, cfg, _ = oracle
    state = reference_state_numpy(model)
    state["bogus.key"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError):
        convert_torch_state_dict(state, cfg)
    state2 = reference_state_numpy(model)
    del state2["head.scratch.output_conv1.bias"]
    with pytest.raises(KeyError):
        convert_torch_state_dict(state2, cfg)


def test_forward_parity_square(oracle, rng):
    # 70×70 → 5×5 patches: exercises pos-embed bicubic interpolation.
    x = rng.randn(1, 4, 3, 70, 70).astype(np.float32)
    got, want = _run_both(oracle, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_forward_parity_rect(oracle, rng):
    # Non-square, odd patch grid (4×7): stride-2 conv + fusion resize paths.
    x = rng.randn(1, 2, 3, 56, 98).astype(np.float32)
    got, want = _run_both(oracle, x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_forward_parity_skip_tmp_block(oracle, rng):
    x = rng.randn(1, 2, 3, 56, 56).astype(np.float32)
    got, want = _run_both(oracle, x, skip_tmp_block=True)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_bf16_path_within_accuracy_budget(oracle, rng):
    """bf16 compute with fp32 islands must stay well inside the <1% AbsRel
    deviation budget vs the fp32 path (BASELINE.md target)."""
    _, cfg, params = oracle
    module = VideoDepthAnything(cfg)
    x = rng.randn(1, 2, 56, 56, 3).astype(np.float32)
    f = jax.jit(lambda p, xx: module.apply({"params": p}, xx))
    d32 = np.asarray(f(params, jnp.asarray(x)), dtype=np.float32)
    d16 = np.asarray(
        f(params, jnp.asarray(x, dtype=jnp.bfloat16)), dtype=np.float32
    )
    rel = np.abs(d16 - d32).mean() / (np.abs(d32).mean() + 1e-8)
    assert rel < 0.01, f"bf16 deviation {rel:.4f} exceeds 1%"
