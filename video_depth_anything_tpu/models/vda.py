"""Top-level VideoDepthAnything model.

Equivalent of the reference wrapper (``video_depth_anything/video_depth.py:
35-89``): DINOv2 encoder over flattened frames → temporal DPT head →
bilinear upsample to the input resolution → ReLU → inverse depth
``[B, T, H, W]``.

Functional JAX design: ``VideoDepthAnything`` is a linen module; use
``init_params`` / ``apply`` (or the convenience ``VDAModel`` bundle that
carries params + a jitted window function).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_depth_anything_tpu.config import ModelConfig, get_model_config
from video_depth_anything_tpu.models.dinov2 import DinoViT
from video_depth_anything_tpu.models.dpt import DPTHeadTemporal
from video_depth_anything_tpu.ops.resize import bilinear_resize


class VideoDepthAnything(nn.Module):
    """``__call__(x)`` with ``x: (B, T, H, W, 3)`` normalized frames
    (ImageNet mean/std), H and W multiples of 14 → ``(B, T, H, W)``
    non-negative inverse depth."""

    cfg: ModelConfig
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip_tmp_block: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        b, t, h, w, _ = x.shape
        p = cfg.vit.patch_size
        if h % p or w % p:
            raise ValueError(
                f"frame size ({h}, {w}) must be a multiple of the ViT patch "
                f"size {p}; use utils.transform.Resize to preprocess"
            )
        ph, pw = h // p, w // p
        frames = x.reshape(b * t, h, w, 3)
        feats = DinoViT(cfg.vit, self.attn_impl, name="pretrained")(
            frames, cfg.intermediate_layer_idx
        )
        depth = DPTHeadTemporal(cfg, self.attn_impl, name="head")(
            feats, b, t, ph, pw, skip_tmp_block
        )
        # Head returns fp32 (output_conv2 island); the reference casts back to
        # the autocast dtype before the final upsample (video_depth.py:370).
        depth = depth.astype(x.dtype)
        depth = bilinear_resize(depth, h, w)
        depth = nn.relu(depth)
        return depth.reshape(b, t, h, w)


class VDAModel:
    """Convenience bundle: config + params + jitted window forward.

    ``infer_window(frames)`` takes normalized ``(B, T, H, W, 3)`` and returns
    ``(B, T, H, W)`` inverse depth.  Compiles once per input shape.
    """

    def __init__(
        self,
        encoder: str = "vits",
        params=None,
        dtype: jnp.dtype = jnp.bfloat16,
        attn_impl: str = "xla",
        cfg: Optional[ModelConfig] = None,
    ):
        self.cfg = cfg or get_model_config(encoder)
        self.dtype = dtype
        self.module = VideoDepthAnything(self.cfg, attn_impl)
        self.params = params

    def init_params(self, rng: jax.Array, frames: int = 2, size: int = 28):
        dummy = jnp.zeros((1, frames, size, size, 3), dtype=jnp.float32)
        self.params = jax.jit(self.module.init)(rng, dummy)["params"]
        return self.params

    @functools.cached_property
    def _jit_forward(self):
        @functools.partial(jax.jit, static_argnames=("skip_tmp_block",))
        def fwd(params, x, skip_tmp_block=False):
            return self.module.apply(
                {"params": params}, x, skip_tmp_block=skip_tmp_block
            )

        return fwd

    def infer_window(self, frames, skip_tmp_block: bool = False):
        x = jnp.asarray(frames, dtype=self.dtype)
        return self._jit_forward(self.params, x, skip_tmp_block=skip_tmp_block)
