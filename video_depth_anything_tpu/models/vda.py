"""Top-level VideoDepthAnything model.

Equivalent of the reference wrapper (``video_depth_anything/video_depth.py:
35-89``): DINOv2 encoder over flattened frames → temporal DPT head →
bilinear upsample to the input resolution → ReLU → inverse depth
``[B, T, H, W]``.

Functional JAX design: ``VideoDepthAnything`` is a linen module; use
``init_params`` / ``apply`` (or the convenience ``VDAModel`` bundle that
carries params + a jitted window function).  Besides the batch window
``__call__`` it exposes the two streaming-mode methods
(``encode_level_features`` / ``streaming_step``, ref
``video_depth.py:67-89``), invoked via ``module.apply(..., method=...)``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

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
    attn_impl: str = "auto"

    def setup(self):
        self.pretrained = DinoViT(self.cfg.vit, self.attn_impl)
        self.head = DPTHeadTemporal(self.cfg, self.attn_impl)

    def _check_hw(self, h: int, w: int) -> Tuple[int, int]:
        p = self.cfg.vit.patch_size
        if h % p or w % p:
            raise ValueError(
                f"frame size ({h}, {w}) must be a multiple of the ViT patch "
                f"size {p}; use utils.transform.Resize to preprocess"
            )
        return h // p, w // p

    def __call__(self, x: jnp.ndarray, skip_tmp_block: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        b, t, h, w, _ = x.shape
        ph, pw = self._check_hw(h, w)
        frames = x.reshape(b * t, h, w, 3)
        feats = self.pretrained(frames, cfg.intermediate_layer_idx)
        depth = self.head(feats, b, t, ph, pw, skip_tmp_block)
        # Head returns fp32 (output_conv2 island); the reference casts back to
        # the autocast dtype before the final upsample (video_depth.py:370).
        depth = depth.astype(x.dtype)
        depth = bilinear_resize(depth, h, w)
        return depth.reshape(b, t, h, w)

    # -- streaming-mode methods (apply with method=...) ---------------------

    def encode_level_features(self, x: jnp.ndarray):
        """``(N, H, W, 3)`` frames → 4 per-frame pre-motion level features
        for the cache (ref ``get_motion_features``)."""
        n, h, w, _ = x.shape
        ph, pw = self._check_hw(h, w)
        feats = self.pretrained(x, self.cfg.intermediate_layer_idx)
        return self.head.level_features(feats, ph, pw)

    def streaming_step(
        self,
        x: jnp.ndarray,
        cached,
        pred_idx: Optional[Tuple[int, ...]] = None,
        skip_tmp_block: bool = False,
    ):
        """One frame ``(1, H, W, 3)`` + cached level features → (depth at
        input resolution ``(P, H, W)``, new level features)."""
        _, h, w, _ = x.shape
        ph, pw = self._check_hw(h, w)
        feats = self.pretrained(x, self.cfg.intermediate_layer_idx)
        depth, new_feats = self.head.streaming_forward(
            feats, cached, ph, pw, pred_idx=pred_idx, skip_tmp_block=skip_tmp_block
        )
        depth = depth.astype(x.dtype)
        depth = bilinear_resize(depth, h, w)
        return depth[..., 0], new_feats


    def streaming_head_step(
        self,
        levels,
        cached,
        pred_idx: Optional[Tuple[int, ...]] = None,
        skip_tmp_block: bool = False,
    ):
        """Post-encoder feature-cache streaming step: the new frame's
        pre-motion level features + gathered cache windows → (depth at
        input resolution ``(P, H, W)``, new level features).  The
        cache-sequential half of ``streaming_step`` — the chunked aligned
        mode batches the encoder over K frames and ``lax.scan``s this."""
        l1 = levels[0]
        ph = l1.shape[1] // 4
        pw = l1.shape[2] // 4
        depth, new_feats = self.head.streaming_head_step(
            levels, cached, ph, pw, pred_idx=pred_idx,
            skip_tmp_block=skip_tmp_block,
        )
        depth = depth.astype(l1.dtype)
        depth = bilinear_resize(depth, ph * 14, pw * 14)
        return depth[..., 0], new_feats

    def streaming_chunk_step(
        self,
        x: jnp.ndarray,
        cache,
        gather_idx: jnp.ndarray,
        skip_tmp_block: bool = False,
    ):
        """K steady-state streaming frames ``(K, H, W, 3)`` in one program.

        ``cache``: the 4 per-level feature caches ``(cache_len, ...)``;
        ``gather_idx (K, T−1)`` indexes the *extended* buffer
        ``concat(cache, new_features)`` — positions ≥ cache_len refer to
        frames of this same chunk (the host resolves the sliding-slot
        permutation, ``inference/streaming.py``).  Returns
        ``(depth (K, H, W), new level features ×4)`` — the caller scatters
        the new features into their freed cache slots.
        """
        k, h, w, _ = x.shape
        ph, pw = self._check_hw(h, w)
        feats = self.pretrained(x, self.cfg.intermediate_layer_idx)
        n1, n2, n3, n4 = self.head.level_features(feats, ph, pw)
        _, _, c3, c4 = cache
        ext3 = jnp.concatenate([c3, n3], axis=0)
        ext4 = jnp.concatenate([c4, n4], axis=0)
        w3 = jnp.concatenate([ext3[gather_idx], n3[:, None]], axis=1)
        w4 = jnp.concatenate([ext4[gather_idx], n4[:, None]], axis=1)
        depth = self.head.streaming_chunk_forward(
            n1, n2, w3, w4, ph, pw, skip_tmp_block
        )
        depth = depth.astype(x.dtype)
        depth = bilinear_resize(depth, h, w)
        return depth[..., 0], (n1, n2, n3, n4)

    # -- KV-cache streaming methods -----------------------------------------

    def streaming_kv_start(self, x: jnp.ndarray, skip_tmp_block: bool = False):
        """Warmup: one batch window ``(1, T, H, W, 3)`` → (depth
        ``(1, T, H, W)``, motion-module KV caches).  The caches hold every
        window frame; the pipeline drops the oldest before the first
        kv step."""
        cfg = self.cfg
        b, t, h, w, _ = x.shape
        ph, pw = self._check_hw(h, w)
        frames = x.reshape(b * t, h, w, 3)
        feats = self.pretrained(frames, cfg.intermediate_layer_idx)
        depth, caches = self.head.window_forward_collect_kv(
            feats, b, t, ph, pw, skip_tmp_block
        )
        depth = depth.astype(x.dtype)
        depth = bilinear_resize(depth, h, w)
        return depth.reshape(b, t, h, w), caches

    def streaming_kv_step(
        self,
        x: jnp.ndarray,
        kv_caches,
        skip_tmp_block: bool = False,
        anchor_levels=None,
    ):
        """One newest frame ``(1, H, W, 3)`` + KV caches → (depth
        ``(Q, H, W)`` at input resolution, shifted caches).  O(1) per frame:
        nothing outside this frame is recomputed.  With ``anchor_levels``
        (realignment mode) the anchor frame is re-predicted too — depth row
        0 is the anchor's fresh prediction, row 1 the newest frame's — and
        cache slot 0 stays pinned to the anchor (``streaming_kv_forward``)."""
        _, h, w, _ = x.shape
        ph, pw = self._check_hw(h, w)
        feats = self.pretrained(x, self.cfg.intermediate_layer_idx)
        depth, new_caches = self.head.streaming_kv_forward(
            feats, kv_caches, ph, pw, skip_tmp_block=skip_tmp_block,
            anchor_levels=anchor_levels,
        )
        depth = depth.astype(x.dtype)
        depth = bilinear_resize(depth, h, w)
        return depth[..., 0], new_caches

    def streaming_kv_head_step(
        self,
        levels,
        kv_caches,
        skip_tmp_block: bool = False,
        anchor_levels=None,
    ):
        """Post-encoder KV step: per-frame pre-motion level features (each
        ``(1, h_l, w_l, C_l)``) + caches → (depth ``(Q, H, W)`` at input
        resolution, new caches).  The cache-sequential half of
        ``streaming_kv_step`` — the chunked KV pipeline batches the encoder
        over K frames and ``lax.scan``s this."""
        l1 = levels[0]
        ph = l1.shape[1] // 4  # level-1 maps are 4x patch resolution
        pw = l1.shape[2] // 4
        depth, new_caches = self.head.streaming_kv_head_step(
            levels, kv_caches, ph, pw, skip_tmp_block=skip_tmp_block,
            anchor_levels=anchor_levels,
        )
        depth = depth.astype(l1.dtype)
        depth = bilinear_resize(depth, ph * 14, pw * 14)
        return depth[..., 0], new_caches


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
        attn_impl: str = "auto",
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
