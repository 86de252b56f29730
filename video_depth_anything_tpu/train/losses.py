"""Training losses for temporal fine-tuning.

The reference fork contains **no training code** (its ``train.py`` is a VRAM
stress tool, SURVEY.md §2.5); these losses are built from the upstream paper
(arXiv:2501.12375 §3.3): scale-shift-invariant disparity loss plus a
temporal gradient matching (TGM) loss that penalizes frame-to-frame
disparity changes that disagree with ground truth.

All reductions are mask-weighted and fp32.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def masked_scale_shift(pred, target, mask, eps: float = 1e-6):
    """Closed-form per-frame (s, t) minimizing ``||m·(s·pred + t − target)||²``
    over the trailing spatial axes.  Shapes ``(..., H, W)``; returns
    broadcastable ``(..., 1, 1)`` s and t."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    ax = (-2, -1)
    a00 = jnp.sum(m * pred * pred, axis=ax, keepdims=True)
    a01 = jnp.sum(m * pred, axis=ax, keepdims=True)
    a11 = jnp.sum(m, axis=ax, keepdims=True)
    b0 = jnp.sum(m * pred * target, axis=ax, keepdims=True)
    b1 = jnp.sum(m * target, axis=ax, keepdims=True)
    det = a00 * a11 - a01 * a01
    safe = jnp.abs(det) > eps
    s = jnp.where(safe, (a11 * b0 - a01 * b1) / jnp.where(safe, det, 1.0), 1.0)
    t = jnp.where(safe, (-a01 * b0 + a00 * b1) / jnp.where(safe, det, 1.0), 0.0)
    return s, t


def ssi_loss(pred, target, mask) -> jnp.ndarray:
    """Scale-shift-invariant MAE on disparity: per-frame align then
    mask-weighted L1.  ``pred, target, mask: (B, T, H, W)``."""
    s, t = masked_scale_shift(pred, target, mask)
    aligned = pred.astype(jnp.float32) * s + t
    m = mask.astype(jnp.float32)
    err = jnp.abs(aligned - target.astype(jnp.float32)) * m
    return jnp.sum(err) / jnp.maximum(jnp.sum(m), 1.0)


def tgm_loss(pred, target, mask) -> jnp.ndarray:
    """Temporal gradient matching: L1 between consecutive-frame disparity
    deltas of (per-frame aligned) prediction and target, on pixels valid in
    both frames."""
    s, t = masked_scale_shift(pred, target, mask)
    aligned = pred.astype(jnp.float32) * s + t
    tgt = target.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    dp = aligned[:, 1:] - aligned[:, :-1]
    dg = tgt[:, 1:] - tgt[:, :-1]
    mm = m[:, 1:] * m[:, :-1]
    err = jnp.abs(dp - dg) * mm
    return jnp.sum(err) / jnp.maximum(jnp.sum(mm), 1.0)


def video_depth_loss(
    pred, target, mask, tgm_weight: float = 10.0
) -> Tuple[jnp.ndarray, dict]:
    l_ssi = ssi_loss(pred, target, mask)
    l_tgm = tgm_loss(pred, target, mask)
    total = l_ssi + tgm_weight * l_tgm
    return total, {"loss": total, "ssi": l_ssi, "tgm": l_tgm}
