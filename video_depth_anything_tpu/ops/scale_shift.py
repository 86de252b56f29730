"""Scale/shift alignment math for window stitching.

The closed-form masked least-squares solve for ``pred*s + t ≈ target``
(reference ``utils/util.py:16-62``) plus the overlap cross-fade weights
(``utils/util.py:65-74``).  Two implementations:

* numpy (host) — used by the sequential stitching pass, bit-matching the
  reference (fp32 accumulation).
* jax — reduction-only form for on-device / multi-chip use: the six scalars
  (a_00, a_01, a_11, b_0, b_1 and the solve) reduce with ``psum`` over a
  mesh axis when the overlap pixels are sharded (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def compute_scale_and_shift(
    prediction: np.ndarray, target: np.ndarray, mask: np.ndarray | None = None,
    scale_only: bool = False,
) -> Tuple[float, float]:
    """Least-squares (s, t) minimizing ``||mask·(s·pred + t − target)||²``."""
    prediction = np.asarray(prediction, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    if mask is None:
        mask = np.ones_like(prediction)
    mask = np.asarray(mask, dtype=np.float32)

    a_00 = np.sum(mask * prediction * prediction)
    a_01 = np.sum(mask * prediction)
    a_11 = np.sum(mask)
    b_0 = np.sum(mask * prediction * target)

    if scale_only:
        return float(b_0 / (a_00 + 1e-6)), 0.0

    b_1 = np.sum(mask * target)
    det = a_00 * a_11 - a_01 * a_01
    if det == 0:
        return 1.0, 0.0
    s = (a_11 * b_0 - a_01 * b_1) / det
    t = (-a_01 * b_0 + a_00 * b_1) / det
    return float(s), float(t)


def compute_scale_and_shift_jax(prediction, target, mask=None, axis_name=None):
    """jax version; with ``axis_name`` the moment sums are ``psum``-reduced
    across a mesh axis so each shard only sees its overlap pixels."""
    import jax

    pred = prediction.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    m = jnp.ones_like(pred) if mask is None else mask.astype(jnp.float32)

    moments = jnp.stack(
        [
            jnp.sum(m * pred * pred),
            jnp.sum(m * pred),
            jnp.sum(m),
            jnp.sum(m * pred * tgt),
            jnp.sum(m * tgt),
        ]
    )
    if axis_name is not None:
        moments = jax.lax.psum(moments, axis_name)
    a_00, a_01, a_11, b_0, b_1 = moments
    det = a_00 * a_11 - a_01 * a_01
    s = jnp.where(det != 0, (a_11 * b_0 - a_01 * b_1) / det, 1.0)
    t = jnp.where(det != 0, (-a_01 * b_0 + a_00 * b_1) / det, 0.0)
    return s, t


def interpolation_weights(n: int) -> np.ndarray:
    """Cross-fade weights for the n-frame overlap (ref ``utils/util.py:65-74``):
    w[0]=0, w[n-1]=1, linear in between; returns the *post* weights."""
    if n == 1:
        return np.array([1.0], dtype=np.float32)
    step = 1.0 / (n - 1)
    return np.array([0.0] + [i * step for i in range(1, n - 1)] + [1.0], dtype=np.float32)
