"""Pallas TPU attention kernels (filled in behind ``ops.attention``).

``try_flash_attention`` returns ``None`` when no kernel covers the given
shape/platform, in which case the caller uses the XLA dense path.  This keeps
kernel availability a pure performance concern — numerics are defined by the
XLA path and the kernels must match it within tolerance (see
``tests/test_pallas_kernels.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["try_flash_attention"]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def try_flash_attention(q, k, v, scale, fast_softmax: bool = False):
    """Dispatch to a Pallas kernel when one fits; ``None`` → XLA fallback."""
    if not _on_tpu():
        return None
    from video_depth_anything_tpu.ops import pallas_attention

    return pallas_attention.try_spatial_attention(
        q, k, v, scale, fast_softmax=fast_softmax
    )
