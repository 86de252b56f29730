"""Torch-oracle parity for the vitl / vitb configurations.

Round-1 parity fixtures built vits only; vitl has different tap layers
([4, 11, 17, 23]), head widths (features=256, out_channels up to 1024) and
16 attention heads — converter or head-wiring bugs specific to those dims
would otherwise only surface as garbage depth on real weights.  These tests
run the full torch reference (seeded random weights) at a small frame size
and compare the JAX model weight-exactly, plus the vitl-only fused output
tail against the torch tail math, and the bf16 deviation budget at vitl
dims (VERDICT round 1, items 2 and 6).

All marked slow: the vitl oracle instantiates a 381.8M-param torch model.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import load_reference_vda, reference_state_numpy
from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.io.checkpoint import (
    convert_torch_state_dict,
    export_torch_state_dict,
)
from video_depth_anything_tpu.models import VideoDepthAnything

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def oracle_vitl():
    model = load_reference_vda("vitl", seed=0)
    state = reference_state_numpy(model)
    cfg = get_model_config("vitl")
    params = convert_torch_state_dict(state, cfg)
    return model, cfg, params


def _run_both(model, cfg, params, x_btchw, skip_tmp_block=False):
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


def test_forward_parity_vitl(oracle_vitl, rng):
    # 70×70 → 5×5 patches: covers taps [4,11,17,23], the 256-wide head,
    # 1024/1024-channel motion modules, and pos-embed interpolation at
    # vitl's 16-head dims.
    model, cfg, params = oracle_vitl
    x = rng.randn(1, 2, 3, 70, 70).astype(np.float32)
    got, want = _run_both(model, cfg, params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_converter_roundtrip_vitl(oracle_vitl):
    # strict both ways at vitl dims: every torch key consumed, every param
    # produced, and export returns the exact bytes (reference run.py:80
    # strict=True contract).
    model, cfg, params = oracle_vitl
    state = reference_state_numpy(model)
    back = export_torch_state_dict(params, cfg)
    missing = set(state) - set(back)
    # deterministic/dead buffers are dropped by design
    assert all(
        ("pos_encoder.pe" in k or k == "pretrained.mask_token") for k in missing
    ), missing
    for k in back:
        if "pos_encoder.pe" in k:
            # deterministic sinusoid, recomputed in fp64 on export — agrees
            # with the torch fp32 buffer to ~1 fp32 ulp, not bit-exactly
            np.testing.assert_allclose(back[k], state[k], atol=2e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(back[k], state[k], err_msg=k)


def test_fused_output_tail_matches_torch_vitl(oracle_vitl, rng):
    """The fused Pallas tail (vitl's default on TPU) vs the torch tail math
    [bilinear align_corners resize → conv3×3 → ReLU → conv1×1 → ReLU]
    (reference dpt.py:155-157 + dpt_temporal.py:91-97), interpret mode."""
    import torch.nn.functional as F

    from video_depth_anything_tpu.ops.pallas_output_stack import (
        try_fused_output_tail,
    )

    model, cfg, params = oracle_vitl
    conv2 = model.head.scratch.output_conv2  # Sequential(conv3x3, ReLU, conv1x1, ReLU)
    k1 = conv2[0].weight.detach().numpy()  # (32, 128, 3, 3) OIHW
    b1 = conv2[0].bias.detach().numpy()
    k2 = conv2[2].weight.detach().numpy()  # (1, 32, 1, 1)
    b2 = conv2[2].bias.detach().numpy()

    t, h, w = 2, 16, 24
    out_h, out_w = 28, 42  # 8·ph → 14·ph ratio of the production tail
    x = rng.randn(t, h, w, 128).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = F.interpolate(
            xt, (out_h, out_w), mode="bilinear", align_corners=True
        )
        want = conv2(want).numpy()[:, 0]

    got = try_fused_output_tail(
        jnp.asarray(x, jnp.bfloat16),
        jnp.asarray(np.transpose(k1, (2, 3, 1, 0))),  # HWIO
        jnp.asarray(b1),
        jnp.asarray(k2.reshape(1, 1, 32, 1)),
        jnp.asarray(b2),
        out_h,
        out_w,
        interpret=True,
    )
    assert got is not None, "fused tail did not cover the vitl shape"
    got = np.asarray(got, dtype=np.float32)[..., 0]
    assert got.shape == want.shape
    # bf16 data path: bounded by a few bf16 ulps of the activation scale
    denom = np.abs(want).max() + 1e-8
    assert np.abs(got - want).max() / denom < 0.02, (
        np.abs(got - want).max() / denom
    )


def test_bf16_path_within_accuracy_budget_vitl(oracle_vitl, rng):
    """bf16 + island-off + tanh-GELU at vitl dims (24 blocks of bf16
    accumulation) must stay inside the <1% AbsRel-equivalent budget vs the
    fp32 path (VERDICT round 1, weak #6)."""
    _, cfg, params = oracle_vitl
    module = VideoDepthAnything(cfg)
    x = rng.randn(1, 2, 56, 56, 3).astype(np.float32)
    f = jax.jit(lambda p, xx: module.apply({"params": p}, xx))
    d32 = np.asarray(f(params, jnp.asarray(x)), dtype=np.float32)
    d16 = np.asarray(
        f(params, jnp.asarray(x, dtype=jnp.bfloat16)), dtype=np.float32
    )
    rel = np.abs(d16 - d32).mean() / (np.abs(d32).mean() + 1e-8)
    assert rel < 0.01, f"vitl bf16 deviation {rel:.4f} exceeds 1%"


def test_forward_parity_vitb(rng):
    # vitb: 12 blocks/768 dim/12 heads, features=128, out_channels
    # [96,192,384,768] — the only encoder whose dims round-1 never
    # oracle-tested at all.
    model = load_reference_vda("vitb", seed=0)
    state = reference_state_numpy(model)
    cfg = get_model_config("vitb")
    params = convert_torch_state_dict(state, cfg)
    x = rng.randn(1, 2, 3, 56, 70).astype(np.float32)
    got, want = _run_both(model, cfg, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_forward_parity_fullres_vits(rng):
    """Production-resolution oracle (round-3 verdict item 7): vits at the
    real 518² input — 37×37 patch grid, so the bicubic pos-embed
    interpolation with the 0.1 offset (dinov2.py:179-210, SURVEY §7 hard
    part 1) runs at its production geometry instead of the 5×5-scale grids
    the other parity tests cover."""
    model = load_reference_vda("vits", seed=0)
    state = reference_state_numpy(model)
    cfg = get_model_config("vits")
    params = convert_torch_state_dict(state, cfg)
    x = rng.randn(1, 2, 3, 518, 518).astype(np.float32)
    got, want = _run_both(model, cfg, params, x)
    assert got.shape == want.shape == (1, 2, 518, 518)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)
