"""ctypes binding for the native preprocessing library.

Loads ``native/libvda_preproc.so`` (built by ``make -C native``); when the
library is missing it builds it on first use if a toolchain is present,
else callers fall back to the cv2 path in ``utils.transform``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from video_depth_anything_tpu.utils.transform import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    model_size_for,
)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvda_preproc.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vda_preprocess_frames.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.vda_gather_windows.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def preprocess_frames_native(
    frames: np.ndarray, input_size: int = 518, target_hw=None
) -> Optional[np.ndarray]:
    """uint8 RGB ``(N, H, W, 3)`` → normalized float32 ``(N, h, w, 3)``;
    ``None`` when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    dh, dw = target_hw or model_size_for(h, w, input_size)
    out = np.empty((n, dh, dw, 3), dtype=np.float32)
    mean = np.ascontiguousarray(IMAGENET_MEAN, dtype=np.float32)
    std = np.ascontiguousarray(IMAGENET_STD, dtype=np.float32)
    lib.vda_preprocess_frames(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        h,
        w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dh,
        dw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def gather_windows_native(
    pre: np.ndarray, indices: np.ndarray
) -> Optional[np.ndarray]:
    """``pre (F, h, w, 3)`` f32 + ``indices (W, T)`` → ``(W, T, h, w, 3)``."""
    lib = _load()
    if lib is None:
        return None
    pre = np.ascontiguousarray(pre, dtype=np.float32)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    n_win, win_len = indices.shape
    frame_elems = int(np.prod(pre.shape[1:]))
    out = np.empty((n_win, win_len) + pre.shape[1:], dtype=np.float32)
    lib.vda_gather_windows(
        pre.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_win,
        win_len,
        frame_elems,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
