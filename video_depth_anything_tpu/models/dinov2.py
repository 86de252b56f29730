"""DINOv2 ViT encoder, TPU-native.

Functionally equivalent to the reference encoder (``video_depth_anything/
dinov2.py:44-415`` + ``dinov2_layers/``) for the inference configuration the
released checkpoints use (``img_size=518, patch_size=14, LayerScale init 1.0,
block_chunks=0, no register tokens``), but designed for XLA rather than
translated:

* NHWC activations end-to-end; the 14×14/stride-14 patch embed is a
  reshape + one GEMM (non-overlapping patches ≡ matmul) instead of a conv.
* Fused-QKV attention with heads kept in the last two axes and fp32 softmax
  (``ops.attention``); xformers' role is played by XLA fusion / Pallas.
* Positional-embedding bicubic interpolation with the reference's
  ``interpolate_offset=0.1`` scale-factor semantics (``dinov2.py:179-210``)
  is two host-built weight matrices applied as GEMMs (``ops.resize``).
* Intermediate-layer taps (``dinov2.py:297-321``): the forward returns the
  post-final-LayerNorm patch tokens of the configured blocks — the only
  encoder output the depth head consumes.

Dead-at-inference reference machinery (stochastic depth, nested-tensor
blocks, masking, registers) is intentionally absent.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from video_depth_anything_tpu.config import ViTConfig
from video_depth_anything_tpu.ops.attention import multi_head_attention
from video_depth_anything_tpu.ops.resize import bicubic_pos_embed_resize


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default is the exact erf form — used for fp32 parity.
    # In bf16 the tanh approximation halves VPU cost (13.6 → 7.2 ms on the
    # (175k, 4096) MLP tile, docs/PERFORMANCE.md) and its ~1e-3 relative
    # deviation is far inside the bf16 rounding budget.
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


class Attention(nn.Module):
    """Fused-QKV multi-head self-attention (ref ``dinov2_layers/attention.py:29-62``)."""

    dim: int
    num_heads: int
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv", dtype=x.dtype)(x)
        # contiguous last-axis split (cheap) — NOT the torch (3, H, D)
        # interleave, so the converter's fused-qkv weight stays the torch
        # row order [q; k; v] and slicing here matches it exactly
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, n, self.num_heads, head_dim)
        v = v.reshape(b, n, self.num_heads, head_dim)
        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, n, c)
        return nn.Dense(self.dim, name="proj", dtype=x.dtype)(out)


class Mlp(nn.Module):
    """GELU MLP (ref ``dinov2_layers/mlp.py:17-41``)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc1", dtype=x.dtype)(x)
        x = _gelu(x)
        return nn.Dense(self.dim, name="fc2", dtype=x.dtype)(x)


class SwiGLU(nn.Module):
    """SwiGLU FFN used by vitg (ref ``dinov2_layers/swiglu_ffn.py:13-63``):
    hidden = ((4·D·2/3) + 7) // 8 * 8, ``silu(x1)·x2`` gating."""

    dim: int
    hidden: int  # pre-adjustment width (dim * mlp_ratio)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = (int(self.hidden * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * hidden, name="w12", dtype=x.dtype)(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.dim, name="w3", dtype=x.dtype)(nn.silu(x1) * x2)


class Block(nn.Module):
    """Pre-norm ViT block with LayerScale (ref ``dinov2_layers/block.py:36-107``)."""

    cfg: ViTConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ls1 = self.param("ls1_gamma", nn.initializers.constant(cfg.init_values), (cfg.embed_dim,))
        ls2 = self.param("ls2_gamma", nn.initializers.constant(cfg.init_values), (cfg.embed_dim,))
        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm1", dtype=x.dtype)(x)
        h = Attention(cfg.embed_dim, cfg.num_heads, self.attn_impl, name="attn")(h)
        x = x + h * ls1.astype(x.dtype)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm2", dtype=x.dtype)(x)
        ffn = SwiGLU if cfg.ffn_layer == "swiglufused" else Mlp
        h = ffn(cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio), name="mlp")(h)
        return x + h * ls2.astype(x.dtype)


def interpolate_pos_encoding(
    cfg: ViTConfig, pos_embed: jnp.ndarray, ph: int, pw: int
) -> jnp.ndarray:
    """Interpolate the (1, N+1, D) table to a (1, ph*pw+1, D) table.

    Mirrors ``interpolate_pos_encoding`` (ref ``dinov2.py:179-210``):
    identity when the grid matches and is square; otherwise bicubic with
    scale factors ``(ph + 0.1) / sqrt(N)`` per axis (torch scale-factor
    coordinate semantics, align_corners=False).  Pure function so the
    pipeline-parallel encoder shares it with ``DinoViT``."""
    grid = cfg.pos_grid
    if ph == grid and pw == grid:
        return pos_embed
    pe = pos_embed.astype(jnp.float32)
    cls_pos, patch_pos = pe[:, :1], pe[0, 1:]
    patch_pos = patch_pos.reshape(grid, grid, cfg.embed_dim)
    sh = (ph + cfg.interpolate_offset) / grid
    sw = (pw + cfg.interpolate_offset) / grid
    patch_pos = bicubic_pos_embed_resize(patch_pos, ph, pw, sh, sw)
    patch_pos = patch_pos.reshape(1, ph * pw, cfg.embed_dim)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def embed_tokens(
    cfg: ViTConfig,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    cls_token: jnp.ndarray,
    pos_embed: jnp.ndarray,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Encoder prologue: ``(B, H, W, 3)`` frames → ``(B, ph*pw+1, D)``
    cls+patch tokens with the interpolated positional embedding added
    (ref ``dinov2.py:212-231``).  Shared by ``DinoViT.__call__`` and the
    pipeline-parallel encoder (``parallel.pipeline_parallel``)."""
    b, h, w, _ = x.shape
    p = cfg.patch_size
    ph, pw = h // p, w // p
    dtype = x.dtype
    patches = x.reshape(b, ph, p, pw, p, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, ph * pw, p * p * 3)
    tokens = patches @ kernel.astype(dtype) + bias.astype(dtype)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(cls_token.astype(dtype), (b, 1, cfg.embed_dim)), tokens],
        axis=1,
    )
    return tokens + interpolate_pos_encoding(cfg, pos_embed, ph, pw).astype(dtype)


class DinoViT(nn.Module):
    """DINOv2 encoder over NHWC frames; returns tapped patch-token features.

    ``__call__(x, layer_idx)`` with ``x: (B, H, W, 3)``, H and W multiples of
    14, returns a tuple of ``(B, ph*pw, D)`` arrays — the post-``norm``
    patch tokens of each tapped block, matching the reference's
    ``get_intermediate_layers(..., norm=True)`` with the cls token dropped
    (the head never reads it: ``dpt.py:134``, ``use_clstoken=False``).
    """

    cfg: ViTConfig
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, layer_idx: Sequence[int]
    ) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        b, h, w, _ = x.shape
        p = cfg.patch_size
        ph, pw = h // p, w // p
        dtype = x.dtype

        # Patch embed: non-overlapping p×p conv ≡ patch-flatten + GEMM.
        # Kernel layout (p*p*3, D) with (kh, kw, c) patch ordering — the
        # checkpoint converter reshapes torch's (D, 3, p, p) accordingly.
        kernel = self.param(
            "patch_kernel", nn.initializers.lecun_normal(), (p * p * 3, cfg.embed_dim)
        )
        bias = self.param("patch_bias", nn.initializers.zeros, (cfg.embed_dim,))
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.pos_grid * cfg.pos_grid + 1, cfg.embed_dim),
        )
        tokens = embed_tokens(cfg, kernel, bias, cls_token, pos_embed, x)

        taps = {}
        want = set(int(i) for i in layer_idx)
        for i in range(cfg.depth):
            tokens = Block(cfg, self.attn_impl, name=f"block_{i}")(tokens)
            if i in want:
                taps[i] = tokens

        norm = nn.LayerNorm(epsilon=cfg.norm_eps, name="norm", dtype=dtype)
        # Final LayerNorm applied to every tap (ref dinov2.py:309-312);
        # drop the cls token.
        return tuple(norm(taps[int(i)])[:, 1:] for i in layer_idx)
