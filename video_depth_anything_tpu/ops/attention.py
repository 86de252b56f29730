"""Attention ops for the two attention shapes in the model.

The model has exactly two attention workloads (reference call sites:
``video_depth_anything/dinov2_layers/attention.py:49-81`` and
``video_depth_anything/motion_module/motion_module.py:247-335``):

* **spatial**: self-attention over ``1 + ph*pw`` patch tokens (1370 @ 518²),
  batch ``B*T`` — a classic medium-sequence attention, MXU-bound.
* **temporal**: self-attention over the frame axis (seq = 32) independently
  per spatial location — batch up to ``B*h*w`` (~150k rows), seq tiny.  This
  shape is batch-bound; a flash-style streaming softmax buys nothing at
  seq=32, so the right formulation is dense batched GEMMs with an fp32
  softmax, tiled so the (N, 32, 32) score tensor never round-trips to HBM
  (XLA fuses this; a Pallas kernel is kept behind the same interface).

Both entry points take ``(..., S, H, D)`` arrays (heads separated) and return
``(..., S, H, D)``.  Softmax statistics are always accumulated in fp32
regardless of the compute dtype (TPU bf16 parity requirement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["multi_head_attention"]


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Reference dense attention: fp32 scores/softmax, inputs (..., S, H, D)."""
    dtype = q.dtype
    scores = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * jnp.float32(scale)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "...hqk,...khd->...qhd",
        probs.astype(dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention over ``(..., S, H, D)`` tensors.

    ``impl``: "xla" (dense, compiler-fused), "pallas" (hand-written flash
    kernel; falls back to "xla" for unsupported shapes), or "auto"
    (pallas on TPU, xla elsewhere).  A ``:fast`` suffix (e.g. "auto:fast")
    selects the no-max exp2 softmax in the Pallas kernel — exact softmax
    quotient as long as scaled logits stay inside fp32's exp2 domain
    (±88; see ops/pallas_attention.py), skipping two VPU passes per score
    element.
    """
    head_dim = q.shape[-1]
    scale = head_dim**-0.5
    impl, _, variant = impl.partition(":")
    if impl == "auto":
        impl = "pallas"
    if impl == "pallas":
        from video_depth_anything_tpu.ops import flash_attention

        out = flash_attention.try_flash_attention(
            q, k, v, scale, fast_softmax=variant == "fast"
        )
        if out is not None:
            return out
    return _xla_attention(q, k, v, scale)
