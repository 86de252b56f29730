"""Prediction→ground-truth alignment for evaluation.

Matches the reference's masked least-squares alignment path
(``utils/align.py:151-218``): the model's scale/shift-invariant *inverse*
depth is fitted to inverse ground truth by ``np.linalg.lstsq``, clipped to
[0, 1], inverted, and clipped to the dataset's max depth.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def fit_inverse_alignment(
    prediction: np.ndarray, ground_truth: np.ndarray, valid: np.ndarray
) -> Tuple[float, float]:
    """lstsq fit of ``c0·pred + c1 ≈ 1/gt`` over valid pixels; returns the
    reference's (scale, shift) = (1/c0, −c1/c0) parameterization
    (``utils/align.py:151-160``)."""
    with np.errstate(divide="ignore"):
        gt_inv = 1.0 / ground_truth
    mask = valid & np.isfinite(gt_inv)
    x = prediction[mask].astype(np.float64)[:, None]
    x = np.concatenate([x, np.ones_like(x)], axis=-1)
    coeffs, _, _, _ = np.linalg.lstsq(x, gt_inv[mask].astype(np.float64), rcond=None)
    if np.abs(coeffs[0]) <= 0.0:
        return float("inf"), 0.0
    scale = 1.0 / coeffs[0]
    shift = -coeffs[1] / coeffs[0]
    return float(scale), float(shift)


def align_prediction(
    prediction: np.ndarray,
    ground_truth: np.ndarray,
    valid: np.ndarray,
    max_depth: float = 80.0,
) -> Tuple[np.ndarray, float, float]:
    """Inverse-depth prediction → metric depth aligned to GT
    (ref ``utils/align.py:192-218``): fit in inverse space, clip the aligned
    inverse depth to [0, 1], replace exact zeros with 1e-4, invert, clip to
    ``max_depth``."""
    scale, shift = fit_inverse_alignment(prediction, ground_truth, valid)
    aligned = np.clip((prediction - shift) / scale, 0.0, 1.0)
    aligned = np.where(aligned == 0.0, 1e-4, aligned)
    aligned = np.clip(1.0 / aligned, 0.0, max_depth)
    return aligned, scale, shift
