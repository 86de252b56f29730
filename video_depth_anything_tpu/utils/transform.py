"""Host-side frame preprocessing.

Replicates the reference preprocessing contract exactly (``video_depth_
anything/util/transform.py:5-158`` composed at ``video_depth.py:329-348``):
keep-aspect "lower_bound" resize to ``input_size`` with output dims rounded
to multiples of 14 (cv2 INTER_CUBIC on the [0,1] image), ImageNet
normalization, and the ratio>1.78 input-size shrink
(``video_depth.py:330-334``).  Runs on host CPU with cv2; the model gets
NHWC float32 — no per-frame Python objects, one contiguous array per clip.
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def constrain_to_multiple_of(x: float, multiple: int, min_val: int = 0) -> int:
    y = int(np.round(x / multiple) * multiple)
    if y < min_val:
        y = int(np.ceil(x / multiple) * multiple)
    return y


def effective_input_size(height: int, width: int, input_size: int = 518) -> int:
    """Shrink the nominal input size for wide aspect ratios
    (ref ``video_depth.py:330-334``)."""
    ratio = max(height, width) / min(height, width)
    if ratio > 1.78:
        input_size = int(input_size * 1.777 / ratio)
        input_size = round(input_size / 14) * 14
    return input_size


def model_size_for(height: int, width: int, input_size: int = 518) -> Tuple[int, int]:
    """(model_h, model_w) the reference "lower_bound" resize produces."""
    size = effective_input_size(height, width, input_size)
    scale_h = size / height
    scale_w = size / width
    scale = max(scale_h, scale_w)  # lower_bound: output at least `size`
    new_h = constrain_to_multiple_of(scale * height, 14, min_val=size)
    new_w = constrain_to_multiple_of(scale * width, 14, min_val=size)
    return new_h, new_w


def bucket_model_size(
    height: int, width: int, input_size: int = 518, bucket: int = 56
) -> Tuple[int, int]:
    """Snap the model resolution to multiples of ``bucket`` (itself a
    multiple of 14) to bound jit recompiles across videos of many aspect
    ratios (SURVEY.md §7 hard part 3).  Rounds to nearest, so the aspect
    distortion is at most ``bucket/2`` pixels per axis (~±3.8% at 56/518);
    opt-in (``run.py --shape_bucket``) since it deviates from the
    reference's exact multiple-of-14 sizing."""
    if bucket % 14:
        raise ValueError("bucket must be a multiple of the 14-pixel patch")
    h, w = model_size_for(height, width, input_size)
    bh = max(bucket, int(np.round(h / bucket) * bucket))
    bw = max(bucket, int(np.round(w / bucket) * bucket))
    return bh, bw


def preprocess_frames(
    frames: np.ndarray, input_size: int = 518, target_hw: "Tuple[int, int] | None" = None
) -> np.ndarray:
    """uint8 RGB ``(N, H, W, 3)`` → normalized float32 ``(N, h, w, 3)``
    ready for the model (h, w multiples of 14).  ``target_hw`` overrides the
    reference sizing (used by shape bucketing).

    Dispatches to the native C++ library (fused threaded resize+normalize,
    ``native/preproc.cpp``) unless ``VDA_NATIVE_PREPROC=0``; the cv2 path
    below is the exact-parity reference implementation.
    """
    import os

    if os.environ.get("VDA_NATIVE_PREPROC", "1") != "0" and frames.dtype == np.uint8:
        from video_depth_anything_tpu.io.native_preproc import (
            preprocess_frames_native,
        )

        out = preprocess_frames_native(frames, input_size, target_hw)
        if out is not None:
            return out
    n, h, w, _ = frames.shape
    new_h, new_w = target_hw or model_size_for(h, w, input_size)
    out = np.empty((n, new_h, new_w, 3), dtype=np.float32)
    for i in range(n):
        img = frames[i].astype(np.float32) / 255.0
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
        out[i] = (img - IMAGENET_MEAN) / IMAGENET_STD
    return out
