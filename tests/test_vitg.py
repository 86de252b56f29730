"""vitg / SwiGLU support: layer parity vs the reference SwiGLUFFNFused and a
small-config end-to-end smoke (the full 1.1B vitg is too big for CPU)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import REFERENCE_ROOT, _install_shims
from video_depth_anything_tpu.config import ViTConfig, get_model_config
from video_depth_anything_tpu.models.dinov2 import SwiGLU

pytestmark = pytest.mark.slow  # torch-oracle / multi-process tier: excluded from the fast lane (pytest -m 'not slow')



def test_swiglu_matches_reference(rng):
    import sys

    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    from video_depth_anything.dinov2_layers.swiglu_ffn import SwiGLUFFNFused

    dim, mlp_ratio = 64, 4.0
    torch.manual_seed(0)
    ref = SwiGLUFFNFused(dim, int(dim * mlp_ratio)).eval()

    layer = SwiGLU(dim, int(dim * mlp_ratio))
    params = {
        "w12": {
            "kernel": np.ascontiguousarray(ref.w12.weight.detach().numpy().T),
            "bias": ref.w12.bias.detach().numpy(),
        },
        "w3": {
            "kernel": np.ascontiguousarray(ref.w3.weight.detach().numpy().T),
            "bias": ref.w3.bias.detach().numpy(),
        },
    }
    x = rng.randn(2, 9, dim).astype(np.float32)
    want = ref(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vitg_converter_roundtrip_tiny(rng):
    """The SwiGLU (w12/w3) branch of the checkpoint converter, executed
    both ways strict at toy dims (round-3 verdict item 8: the one
    converter path that had never run).  A torch reference
    VideoDepthAnything is built with a vitg-SHAPED encoder (SwiGLU FFN,
    ``ffn_layer="swiglufused"`` — ``dinov2_layers/swiglu_ffn.py:13-63``)
    at embed_dim 64 / depth 4; convert → export must load strict=True
    into a fresh reference model and preserve its forward bit-for-bit."""
    import dataclasses
    import sys

    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    import video_depth_anything.video_depth as vd
    from video_depth_anything.dinov2 import DinoVisionTransformer

    def tiny_giant(model_name):
        assert model_name == "vitg"
        from functools import partial

        from video_depth_anything.dinov2_layers import (
            MemEffAttention,
            NestedTensorBlock as Block,
        )

        return DinoVisionTransformer(
            img_size=518, patch_size=14, embed_dim=64, depth=4, num_heads=2,
            mlp_ratio=4, block_fn=partial(Block, attn_class=MemEffAttention),
            ffn_layer="swiglufused", init_values=1.0, block_chunks=0,
            num_register_tokens=0, interpolate_antialias=False,
            interpolate_offset=0.1,
        )

    orig = vd.DINOv2
    try:
        vd.DINOv2 = tiny_giant
        torch.manual_seed(0)
        model = vd.VideoDepthAnything(
            encoder="vitg", features=32, out_channels=[32, 32, 64, 64],
            num_frames=4,
        ).eval()
        model.intermediate_layer_idx["vitg"] = [0, 1, 2, 3]
        torch.manual_seed(1)
        model2 = vd.VideoDepthAnything(
            encoder="vitg", features=32, out_channels=[32, 32, 64, 64],
            num_frames=4,
        ).eval()
        model2.intermediate_layer_idx["vitg"] = [0, 1, 2, 3]
    finally:
        vd.DINOv2 = orig

    from video_depth_anything_tpu.io.checkpoint import (
        convert_torch_state_dict,
        export_torch_state_dict,
    )

    base = get_model_config("vitg", num_frames=4)
    cfg = dataclasses.replace(
        base,
        vit=dataclasses.replace(
            base.vit, embed_dim=64, depth=4, num_heads=2
        ),
        features=32,
        out_channels=(32, 32, 64, 64),
        intermediate_layer_idx=(0, 1, 2, 3),
    )

    state = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = convert_torch_state_dict(state, cfg)  # strict: unconsumed raise
    assert "w12" in params["pretrained"]["block_0"]["mlp"]
    back = export_torch_state_dict(params, cfg)
    model2.load_state_dict(
        {k: torch.from_numpy(v) for k, v in back.items()}, strict=True
    )

    x = torch.from_numpy(rng.randn(1, 2, 3, 56, 56).astype(np.float32))
    with torch.no_grad():
        a = model.forward(x).numpy()
        b = model2.forward(x).numpy()
    np.testing.assert_array_equal(a, b)


def test_vitg_config_and_tiny_swiglu_forward():
    cfg = get_model_config("vitg")
    assert cfg.vit.ffn_layer == "swiglufused"
    assert cfg.vit.depth == 40

    # tiny swiglu-ffn ViT end-to-end (structure, not the 1.1B real thing)
    import dataclasses

    from video_depth_anything_tpu.models.dinov2 import DinoViT

    tiny = dataclasses.replace(cfg.vit, embed_dim=64, depth=3, num_heads=2)
    vit = DinoViT(tiny, "xla")
    x = jnp.zeros((1, 28, 28, 3), jnp.float32)
    params = jax.jit(lambda r, xx: vit.init(r, xx, (0, 1, 2, 2)))(
        jax.random.PRNGKey(0), x
    )
    out = vit.apply(params, x, (0, 1, 2))
    assert len(out) == 3 and out[0].shape == (1, 4, 64)
    assert "w12" in params["params"]["block_0"]["mlp"]
