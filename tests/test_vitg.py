"""vitg / SwiGLU support: layer parity vs the reference SwiGLUFFNFused and a
small-config end-to-end smoke (the full 1.1B vitg is too big for CPU)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import REFERENCE_ROOT, _install_shims
from video_depth_anything_tpu.config import ViTConfig, get_model_config
from video_depth_anything_tpu.models.dinov2 import SwiGLU


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
