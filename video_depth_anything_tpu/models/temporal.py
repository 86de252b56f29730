"""Temporal ("motion") attention modules.

Equivalent in function to the AnimateDiff-style temporal transformer the
reference inserts into the DPT head (``video_depth_anything/motion_module/
motion_module.py:32-207``, ``motion_module/attention.py:30-429``), designed
for the TPU's actual workload shape: self-attention along the 32-frame axis
*independently per spatial location*.  In the reference this is a rearrange
``(b f) d c -> (b d) f c`` followed by xformers attention over a huge batch
of tiny sequences (``motion_module.py:253``).  Here the features keep their
natural ``(B, T, H·W, C)`` layout end-to-end (no transposes) and attention
is a pair of einsums contracting over the frame axis with fp32 softmax —
at seq = 32 the 32×32 score tiles fuse in VMEM; a flash kernel buys nothing.

Structure per module (checkpoint-compatible):
  GroupNorm(32) → proj_in → [N_block ×: 2 × (LN → +APE → attn → residual),
  LN → GEGLU FF → residual] → proj_out (zero-init) → + input residual.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_depth_anything_tpu.config import MotionModuleConfig
from video_depth_anything_tpu.models.dinov2 import _gelu
from video_depth_anything_tpu.models.layers import (
    DTypeDense,
    DTypeLayerNorm,
    GroupNorm,
)


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
    """One attention block over the frame axis of ``(B, T, S, C)``.

    The frame axis stays at position 1 (the natural feature-map layout) and
    the attention einsums contract over it directly — the earlier
    ``(B, S, T, C)`` formulation paid two 90 MB transposes per module at the
    vitl path_3 shape (docs/PERFORMANCE.md).

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
            return x + jnp.asarray(pe[:, None, :], dtype=x.dtype)
        return x

    def _qkv(self, x: jnp.ndarray, t: int):
        q = self.to_q(x)
        k = self.to_k(x)
        v = self.to_v(x)
        if self.cfg.pos_embedding_type == "rope":
            cos, sin = rope_tables(self.cfg.temporal_max_len, self.dim)
            cos = jnp.asarray(cos[:t, None, :])
            sin = jnp.asarray(sin[:t, None, :])
            q = _apply_rope(q, cos, sin)
            k = _apply_rope(k, cos, sin)
        return q, k, v

    def _attend(self, q, k, v, b, s, c):
        heads = self.cfg.num_heads
        head_dim = self.dim // heads
        # Measured on v5e (docs/PERFORMANCE.md): XLA's bf16 batched einsum
        # wins at head_dim 128 (m0: 3.9 vs 11.5 ms) while the Pallas kernel
        # wins at head_dim 32 with large S (m3: 11.2 vs 13.8 ms) — "auto"
        # dispatches per shape accordingly; "pallas" forces the kernel for
        # every supported shape.
        base_impl = self.attn_impl.partition(":")[0]
        if base_impl in ("auto", "pallas") and q.shape == k.shape:
            from video_depth_anything_tpu.ops.pallas_temporal import (
                try_temporal_attention,
            )

            out = try_temporal_attention(
                q, k, v, heads=heads, scale=head_dim**-0.5,
                auto=base_impl == "auto",
            )
            if out is not None:
                return self.to_out(out)
        q5 = q.reshape(b, q.shape[1], s, heads, head_dim)
        k5 = k.reshape(b, k.shape[1], s, heads, head_dim)
        v5 = v.reshape(b, v.shape[1], s, heads, head_dim)
        scores = jnp.einsum(
            "bqshd,bkshd->bshqk", q5, k5, preferred_element_type=jnp.float32
        ) * jnp.float32(head_dim**-0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        out = jnp.einsum(
            "bshqk,bkshd->bqshd", probs, v5, preferred_element_type=jnp.float32
        ).astype(q.dtype)
        return self.to_out(out.reshape(b, q.shape[1], s, c))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, s, c = x.shape
        x = self._pos(x, t)
        q, k, v = self._qkv(x, t)
        return self._attend(q, k, v, b, s, c)

    # -- KV-cache streaming ------------------------------------------------
    #
    # The ring caches hold *position-free* projections to_k(x) / to_v(x):
    # to_q/k/v are bias-free (ref motion_module/attention.py), so projection
    # commutes with the positional add — to_k(x + pe) = to_k(x) + to_k(pe) —
    # and APE slots can be assigned at attend time, oldest→newest over the
    # *current* window.  Cached frames therefore keep correct relative
    # positions as the window slides, unlike the reference's experimental
    # ``save_qkv`` cache (motion_module.py:275-288) which bakes each frame's
    # absolute position in at record time (and concatenates keys into the
    # value cache — the :281 bug, fixed here).

    def _pe_proj(self, proj, t: int, dtype) -> jnp.ndarray:
        """(t, 1, C) projected APE contributions for window slots 0..t−1."""
        pe = sinusoidal_position_table(self.cfg.temporal_max_len, self.dim)[:t]
        return proj(jnp.asarray(pe[:, None, :], dtype))

    def call_collect(self, x: jnp.ndarray):
        """Full-window attention that ALSO returns the position-free K/V
        ``(B, T, S, C)`` for seeding a streaming ring cache (warmup)."""
        cfg = self.cfg
        b, t, s, c = x.shape
        k_free = self.to_k(x)
        v_free = self.to_v(x)
        if cfg.pos_embedding_type == "ape":
            q = self.to_q(self._pos(x, t))
            k = k_free + self._pe_proj(self.to_k, t, x.dtype)[None]
            v = v_free + self._pe_proj(self.to_v, t, x.dtype)[None]
        elif cfg.pos_embedding_type == "rope":
            cos, sin = rope_tables(cfg.temporal_max_len, self.dim)
            cos_t = jnp.asarray(cos[:t, None, :])
            sin_t = jnp.asarray(sin[:t, None, :])
            q = _apply_rope(self.to_q(x), cos_t, sin_t)
            k = _apply_rope(k_free, cos_t, sin_t)
            v = v_free
        else:
            q, k, v = self.to_q(x), k_free, v_free
        out = self._attend(q, k, v, b, s, c)
        return out, k_free, v_free

    def kv_step(
        self,
        x_new: jnp.ndarray,
        k_cache: jnp.ndarray,
        v_cache: jnp.ndarray,
        pin_anchor: bool = False,
    ):
        """Query step against a position-free K/V ring cache.

        ``x_new (B, Q, S, C)``: pre-normed hiddens of the query frames —
        the LAST query is the newest frame (the only one whose K/V enter
        the cache).  Leading queries, when present, are re-predicted
        reference frames for per-frame realignment: query ``q < Q−1`` takes
        APE window slot ``q`` (the pinned anchor sits at slot 0 forever,
        mirroring the feature-cache mode's ``tmp[0] = 0`` pin of the global
        first frame), while the newest frame takes the last slot.
        ``k_cache, v_cache (B, T−1, S, C)`` hold the previous frames'
        position-free projections (oldest→newest); all queries attend over
        ``cache ∪ new``.  Eviction: drop the oldest cached frame — or,
        with ``pin_anchor``, drop slot 1 so slot 0 (the global first
        frame's projections) stays resident forever.
        Returns ``(out (B, Q, S, C), k_cache', v_cache')``.
        """
        cfg = self.cfg
        b, nq, s, c = x_new.shape
        t = k_cache.shape[1] + 1
        slots = np.asarray(
            list(range(nq - 1)) + [min(t, cfg.temporal_max_len) - 1]
        )

        k_new = self.to_k(x_new[:, -1:])
        v_new = self.to_v(x_new[:, -1:])
        k_all = jnp.concatenate([k_cache, k_new], axis=1)
        v_all = jnp.concatenate([v_cache, v_new], axis=1)

        if cfg.pos_embedding_type == "ape":
            pe = sinusoidal_position_table(cfg.temporal_max_len, self.dim)
            q = self.to_q(
                x_new + jnp.asarray(pe[slots], x_new.dtype)[None, :, None, :]
            )
            k_att = k_all + self._pe_proj(self.to_k, t, x_new.dtype)[None]
            v_att = v_all + self._pe_proj(self.to_v, t, x_new.dtype)[None]
        elif cfg.pos_embedding_type == "rope":
            cos, sin = rope_tables(cfg.temporal_max_len, self.dim)
            q = _apply_rope(
                self.to_q(x_new),
                jnp.asarray(cos[slots, None, :]),
                jnp.asarray(sin[slots, None, :]),
            )
            k_att = _apply_rope(
                k_all,
                jnp.asarray(cos[:t, None, :]),
                jnp.asarray(sin[:t, None, :]),
            )
            v_att = v_all
        else:
            q, k_att, v_att = self.to_q(x_new), k_all, v_all

        out = self._attend(q, k_att, v_att, b, s, c)
        if pin_anchor:
            return (
                out,
                jnp.concatenate([k_all[:, :1], k_all[:, 2:]], axis=1),
                jnp.concatenate([v_all[:, :1], v_all[:, 2:]], axis=1),
            )
        return out, k_all[:, 1:], v_all[:, 1:]


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
    """2 × (LN → temporal attention → residual) + LN → GEGLU FF → residual.

    Setup-style (param names unchanged from the original compact form) so
    that ``collect`` / ``kv_step`` can reuse the same submodules for the
    KV-cache streaming mode.
    """

    cfg: MotionModuleConfig
    dim: int
    attn_impl: str = "auto"

    def setup(self):
        cfg = self.cfg
        for i in range(cfg.num_attention_blocks):
            setattr(self, f"norm_{i}", DTypeLayerNorm(cfg.layer_norm_eps))
            setattr(
                self,
                f"attn_{i}",
                TemporalSelfAttention(cfg, self.dim, self.attn_impl),
            )
        self.ff_norm = DTypeLayerNorm(cfg.layer_norm_eps)
        self.ff = GEGLUFeedForward(self.dim, cfg.ff_mult)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.cfg.num_attention_blocks):
            h = getattr(self, f"norm_{i}")(x)
            x = x + getattr(self, f"attn_{i}")(h)
        h = self.ff_norm(x)
        return x + self.ff(h)

    def collect(self, x: jnp.ndarray):
        """Full-window forward + position-free K/V per attention block."""
        caches = []
        for i in range(self.cfg.num_attention_blocks):
            h = getattr(self, f"norm_{i}")(x)
            out, kf, vf = getattr(self, f"attn_{i}").call_collect(h)
            x = x + out
            caches.append((kf, vf))
        h = self.ff_norm(x)
        return x + self.ff(h), tuple(caches)

    def kv_step(self, x_new: jnp.ndarray, caches, pin_anchor: bool = False):
        """Query-frame step; ``caches``: tuple per attention block of
        (k_cache, v_cache).  LN/FF run on the query frames only (both are
        strictly per-frame ops)."""
        new_caches = []
        for i in range(self.cfg.num_attention_blocks):
            h = getattr(self, f"norm_{i}")(x_new)
            out, k2, v2 = getattr(self, f"attn_{i}").kv_step(
                h, *caches[i], pin_anchor=pin_anchor
            )
            x_new = x_new + out
            new_caches.append((k2, v2))
        h = self.ff_norm(x_new)
        return x_new + self.ff(h), tuple(new_caches)


class TemporalModule(nn.Module):
    """Full motion module over ``(B, T, H, W, C)`` feature maps."""

    cfg: MotionModuleConfig
    channels: int
    attn_impl: str = "auto"

    def setup(self):
        cfg = self.cfg
        inner = cfg.num_heads * (self.channels // cfg.num_heads)
        self.norm = GroupNorm(cfg.norm_num_groups, cfg.group_norm_eps)
        self.proj_in = DTypeDense(inner)
        for i in range(cfg.num_transformer_blocks):
            setattr(
                self,
                f"block_{i}",
                TemporalTransformerBlock(cfg, inner, self.attn_impl),
            )
        # proj_out is zero-initialised (ref motion_module.py:25-29,61-62), so
        # a freshly initialised module is the identity.
        self.proj_out = DTypeDense(
            self.channels, kernel_init=nn.initializers.zeros
        )

    def _inner(self) -> int:
        return self.cfg.num_heads * (self.channels // self.cfg.num_heads)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        fused = self._try_fused(x)
        if fused is not None:
            return fused
        residual = x
        y = self.proj_in(self.norm(x))
        # (B, T, H, W, C) -> (B, T, H*W, C): transpose-free; the attention
        # einsums contract over the frame axis in place.
        y = y.reshape(b, t, h * w, self._inner())
        if self._layout_barrier(h * w, self._inner()):
            # Stop XLA from fusing proj_in into the attention graph: with
            # the full graph visible it picks a pathological layout for the
            # projection output at these shapes — the barrier alone is
            # worth −5.4 ms on vitl m0 (22.2 → 16.8; round-3 sweep,
            # docs/PERFORMANCE.md "optimization_barrier").  Numerically an
            # identity.
            y = jax.lax.optimization_barrier(y)
        for i in range(self.cfg.num_transformer_blocks):
            y = getattr(self, f"block_{i}")(y)
        y = y.reshape(b, t, h, w, self._inner())
        y = self.proj_out(y)
        return y + residual

    @staticmethod
    def _layout_barrier(s: int, c: int) -> bool:
        """Empirical v5e rule from the round-3 barrier sweep (base →
        barrier ms): wins at every 19²-class module (1024: 5.7→4.9, 384:
        4.3→2.9, 768: 4.4→3.9) and the wide/tiny-head 37² modules (1024:
        22.2→16.8, 192: 6.1→5.3); LOSES at 37² mid widths (256: 4.9→7.8,
        384: 8.8→9.2, 64: 3.0→4.0)."""
        return s <= 512 or c >= 1024 or (c == 192 and s >= 1024)

    def _try_fused(self, x: jnp.ndarray):
        """Whole-module fused Pallas path (ops/pallas_motion.py): one VMEM
        program per location block instead of the HBM-materialized
        GN→proj→attend→FF chain.  Gated to the measured-winning shapes on
        TPU; ``VDA_FUSED_MOTION=0`` disables, ``=1`` forces (where
        supported).  Differentiable (VJP recomputes via the XLA reference
        math)."""
        import os

        mode = os.environ.get("VDA_FUSED_MOTION", "auto")
        if mode == "0" or self.is_initializing():
            return None
        if self.attn_impl.partition(":")[0] == "xla" and mode != "1":
            return None
        if self.channels != self._inner():
            return None  # inner≠channels would need a projected residual
        b, t, h, w, c = x.shape
        d = self._inner() // self.cfg.num_heads
        if mode != "1" and not (h * w >= 2048 and d <= 64):
            # dispatch rule from the v5e whole-module A/Bs vs the
            # production dispatch (scripts/bench_temporal.py --variants
            # fusedmod + the queue4 sweep, docs/PERFORMANCE.md): the fused
            # kernel wins at every large-S (74²-class) module — vitl m3
            # 22.2→15.7, vitb m3 13.1→8.6, vits m3 7.0→4.9 ms — and ties
            # or loses at the 37²/19² shapes (m2 4.96→5.05, vits m1
            # 2.56→3.33) and at d=128 (m0 22.3→32.1: the segment-matrix
            # attend pays 16× FLOP amplification against 8-lane scores).
            return None
        try:
            p = self.variables["params"]
            blk = p["block_0"]
            n = self.cfg.num_attention_blocks
            raw = dict(
                gn_scale=p["norm"]["scale"], gn_bias=p["norm"]["bias"],
                w_in=p["proj_in"]["kernel"], b_in=p["proj_in"]["bias"],
                ln_scale=jnp.stack(
                    [blk[f"norm_{i}"]["scale"] for i in range(n)]
                    + [blk["ff_norm"]["scale"]]
                ),
                ln_bias=jnp.stack(
                    [blk[f"norm_{i}"]["bias"] for i in range(n)]
                    + [blk["ff_norm"]["bias"]]
                ),
                wq=jnp.stack([blk[f"attn_{i}"]["to_q"]["kernel"] for i in range(n)]),
                wk=jnp.stack([blk[f"attn_{i}"]["to_k"]["kernel"] for i in range(n)]),
                wv=jnp.stack([blk[f"attn_{i}"]["to_v"]["kernel"] for i in range(n)]),
                wo=jnp.stack([blk[f"attn_{i}"]["to_out"]["kernel"] for i in range(n)]),
                bo=jnp.stack([blk[f"attn_{i}"]["to_out"]["bias"] for i in range(n)]),
                w1=blk["ff"]["proj"]["kernel"], b1=blk["ff"]["proj"]["bias"],
                w2=blk["ff"]["out"]["kernel"], b2=blk["ff"]["out"]["bias"],
                w_out=p["proj_out"]["kernel"], b_out=p["proj_out"]["bias"],
            )
        except KeyError:  # pragma: no cover - restored partial trees
            return None
        from video_depth_anything_tpu.ops.pallas_motion import (
            try_fused_motion_module,
        )

        out = try_fused_motion_module(
            x.reshape(b, t, h * w, c), raw, heads=self.cfg.num_heads,
            cfg=self.cfg,
        )
        return None if out is None else out.reshape(x.shape)

    def collect(self, x: jnp.ndarray):
        """Full-window forward + KV caches: tuple per transformer block of
        per-attention-block (k, v), each ``(B, T, H·W, inner)``."""
        b, t, h, w, c = x.shape
        residual = x
        y = self.proj_in(self.norm(x))
        y = y.reshape(b, t, h * w, self._inner())
        caches = []
        for i in range(self.cfg.num_transformer_blocks):
            y, ci = getattr(self, f"block_{i}").collect(y)
            caches.append(ci)
        y = y.reshape(b, t, h, w, self._inner())
        y = self.proj_out(y)
        return y + residual, tuple(caches)

    def kv_step(self, x_new: jnp.ndarray, caches, pin_anchor: bool = False):
        """Query frames ``(B, Q, H, W, C)`` step against the module's KV
        caches (last query = newest frame); GroupNorm/proj/FF are
        per-frame, so only the query frames are computed — O(1) per frame
        instead of re-running the 32-frame window."""
        b, t, h, w, c = x_new.shape
        residual = x_new
        y = self.proj_in(self.norm(x_new))
        y = y.reshape(b, t, h * w, self._inner())
        new_caches = []
        for i in range(self.cfg.num_transformer_blocks):
            y, ci = getattr(self, f"block_{i}").kv_step(
                y, caches[i], pin_anchor=pin_anchor
            )
            new_caches.append(ci)
        y = y.reshape(b, t, h, w, self._inner())
        y = self.proj_out(y)
        return y + residual, tuple(new_caches)
