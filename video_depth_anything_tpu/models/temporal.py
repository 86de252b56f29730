"""Temporal ("motion") attention modules.

Equivalent in function to the AnimateDiff-style temporal transformer the
reference inserts into the DPT head (``video_depth_anything/motion_module/
motion_module.py:32-207``, ``motion_module/attention.py:30-429``), designed
for the TPU's actual workload shape: self-attention along the 32-frame axis
*independently per spatial location*.  In the reference this is a rearrange
``(b f) d c -> (b d) f c`` followed by xformers attention over a huge batch
of tiny sequences (``motion_module.py:253``).  Here the frame axis is kept as
a leading tensor axis ``(B, HW, T, C)`` and attention is dense batched GEMMs
with fp32 softmax (``ops.attention``) — at seq = 32 the full 32×32 score
tile lives in registers/VMEM and XLA fuses QK^T → softmax → PV.

Structure per module (checkpoint-compatible):
  GroupNorm(32) → proj_in → [N_block ×: 2 × (LN → +APE → attn → residual),
  LN → GEGLU FF → residual] → proj_out (zero-init) → + input residual.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from video_depth_anything_tpu.config import MotionModuleConfig
from video_depth_anything_tpu.models.dinov2 import _gelu
from video_depth_anything_tpu.models.layers import DTypeDense, GroupNorm
from video_depth_anything_tpu.ops.attention import multi_head_attention


def sinusoidal_position_table(max_len: int, dim: int) -> np.ndarray:
    """Sinusoidal APE table, (max_len, dim) fp32.

    Matches the reference buffer (``motion_module.py:189-207``): even columns
    sin, odd columns cos, with frequency ``exp(-log(10000) * 2i / dim)``.
    Deterministic, so it is computed rather than converted from checkpoints.
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, dim, 2, dtype=np.float64) * (-np.log(10000.0) / dim)
    )
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def rope_tables(max_len: int, dim: int, theta: float = 10000.0):
    """cos/sin tables for the reference's RoPE variant
    (``motion_module/attention.py:403-429``), (max_len, dim/2) each."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    angles = np.outer(np.arange(max_len, dtype=np.float64), freqs)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs (x0, x1) -> (x0·cos − x1·sin, x0·sin + x1·cos) over the
    last axis; ``x`` is (..., T, C), tables are (T, C/2)."""
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    out = jnp.stack([r0, r1], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class TemporalSelfAttention(nn.Module):
    """One attention block over the frame axis of ``(B, S, T, C)``.

    Besides the full-window ``__call__`` this exposes the KV-cache step
    (``kv_step``) — the working equivalent of the reference's experimental
    ``save_qkv`` cross-attention streaming (``motion_module.py:275-288``,
    ``dpt_temporal.py:263-343``), with its bug fixed: the reference
    concatenates ``key`` into the **value** cache (``motion_module.py:281``),
    silently corrupting attention after the first cached frame.
    """

    cfg: MotionModuleConfig
    dim: int
    attn_impl: str = "auto"

    def setup(self):
        self.to_q = DTypeDense(self.dim, use_bias=False)
        self.to_k = DTypeDense(self.dim, use_bias=False)
        self.to_v = DTypeDense(self.dim, use_bias=False)
        self.to_out = DTypeDense(self.dim)

    def _pos(self, x: jnp.ndarray, t: int) -> jnp.ndarray:
        if self.cfg.pos_embedding_type == "ape":
            pe = sinusoidal_position_table(self.cfg.temporal_max_len, self.dim)[:t]
            return x + jnp.asarray(pe, dtype=x.dtype)
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        heads = cfg.num_heads
        head_dim = self.dim // heads
        b, s, t, c = x.shape

        x = self._pos(x, t)
        q = self.to_q(x)
        k = self.to_k(x)
        v = self.to_v(x)

        if cfg.pos_embedding_type == "rope":
            cos, sin = rope_tables(cfg.temporal_max_len, self.dim)
            cos, sin = jnp.asarray(cos[:t]), jnp.asarray(sin[:t])
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)

        q = q.reshape(b, s, t, heads, head_dim)
        k = k.reshape(b, s, t, heads, head_dim)
        v = v.reshape(b, s, t, heads, head_dim)
        out = multi_head_attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, s, t, c)
        return self.to_out(out)

    def kv_step(self, x_new: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray):
        """Single-frame step against a K/V ring cache.

        ``x_new (B, S, 1, C)`` is the pre-normed hidden of the newest frame;
        ``k_cache, v_cache (B, S, T, C)`` hold the previous frames' projected
        keys/values.  The new frame takes the *last* APE slot (the cache is
        ordered oldest→newest), attends over ``cache ∪ new``, and the caches
        are shifted left by one with the new projections appended.
        Returns ``(out (B, S, 1, C), k_cache', v_cache')``.
        """
        cfg = self.cfg
        heads = cfg.num_heads
        head_dim = self.dim // heads
        b, s, _, c = x_new.shape
        t_cache = k_cache.shape[2]

        pe = sinusoidal_position_table(cfg.temporal_max_len, self.dim)
        if cfg.pos_embedding_type == "ape":
            x_pos = x_new + jnp.asarray(pe[min(t_cache, cfg.temporal_max_len - 1)], x_new.dtype)
        else:
            x_pos = x_new
        q = self.to_q(x_pos)
        k_new = self.to_k(x_pos)
        v_new = self.to_v(x_pos)

        k_all = jnp.concatenate([k_cache, k_new], axis=2)
        v_all = jnp.concatenate([v_cache, v_new], axis=2)
        q = q.reshape(b, s, 1, heads, head_dim)
        out = multi_head_attention(
            q,
            k_all.reshape(b, s, t_cache + 1, heads, head_dim),
            v_all.reshape(b, s, t_cache + 1, heads, head_dim),
            impl=self.attn_impl,
        ).reshape(b, s, 1, c)
        # sliding-window eviction: drop the oldest cached frame
        return self.to_out(out), k_all[:, :, 1:], v_all[:, :, 1:]


class GEGLUFeedForward(nn.Module):
    """GEGLU FF (ref ``motion_module/attention.py:296-338,363-384``)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, name="proj", dtype=x.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * _gelu(gate)
        return nn.Dense(self.dim, name="out", dtype=x.dtype)(h)


class TemporalTransformerBlock(nn.Module):
    cfg: MotionModuleConfig
    dim: int
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        for i in range(cfg.num_attention_blocks):
            h = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, name=f"norm_{i}", dtype=x.dtype
            )(x)
            x = x + TemporalSelfAttention(
                cfg, self.dim, self.attn_impl, name=f"attn_{i}"
            )(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ff_norm", dtype=x.dtype)(x)
        return x + GEGLUFeedForward(self.dim, cfg.ff_mult, name="ff")(h)


class TemporalModule(nn.Module):
    """Full motion module over ``(B, T, H, W, C)`` feature maps."""

    cfg: MotionModuleConfig
    channels: int
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        heads = cfg.num_heads
        inner = heads * (self.channels // heads)
        b, t, h, w, c = x.shape

        residual = x
        y = GroupNorm(cfg.norm_num_groups, cfg.group_norm_eps, name="norm")(x)
        y = nn.Dense(inner, name="proj_in", dtype=x.dtype)(y)
        # (B, T, H, W, C) -> (B, H*W, T, C): frame axis becomes the sequence.
        y = y.reshape(b, t, h * w, inner).transpose(0, 2, 1, 3)
        for i in range(cfg.num_transformer_blocks):
            y = TemporalTransformerBlock(
                cfg, inner, self.attn_impl, name=f"block_{i}"
            )(y)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, h, w, inner)
        # proj_out is zero-initialised (ref motion_module.py:25-29,61-62), so
        # a freshly initialised module is the identity.
        y = nn.Dense(
            self.channels,
            name="proj_out",
            dtype=x.dtype,
            kernel_init=nn.initializers.zeros,
        )(y)
        return y + residual
