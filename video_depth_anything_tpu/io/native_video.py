"""ctypes binding for the native video decoder (``native/decode.cpp``).

First-party C++ replacement for the reference's decord dependency
(``utils/dc_utils.py:10,20-38``): libav decode → swscale RGB24 with frame
striding applied inside the decode loop.  Falls back to the cv2 path in
``io.video`` when the library can't be built/loaded or the container
format is unsupported.  The ``max_res`` downscale stays in python
(cv2.resize) so pixels match the cv2 decode path exactly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvda_decode.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_CHUNK = 64  # frames per read call


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s", "libvda_decode.so"],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vda_video_open.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.vda_video_open.restype = ctypes.c_void_p
        lib.vda_video_read.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.vda_video_read.restype = ctypes.c_long
        lib.vda_video_close.argtypes = [ctypes.c_void_p]
        lib.vda_video_close.restype = None
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def read_video_frames_native(
    video_path: str,
    process_length: int = -1,
    target_fps: float = -1,
    max_res: int = -1,
) -> Optional[Tuple[np.ndarray, float]]:
    """Same contract as ``io.video.read_video_frames``; ``None`` → caller
    falls back to cv2."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    handle = lib.vda_video_open(
        video_path.encode(), ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps)
    )
    if not handle:
        return None
    try:
        src_fps = fps.value or 30.0
        out_fps = src_fps if target_fps <= 0 else target_fps
        stride = max(round(src_fps / out_fps), 1)

        chunks = []
        total = 0
        limit = process_length if process_length > 0 else None
        while True:
            want = _CHUNK if limit is None else min(_CHUNK, limit - total)
            if want <= 0:
                break
            buf = np.empty((want, h.value, w.value, 3), dtype=np.uint8)
            got = lib.vda_video_read(
                handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                want,
                stride,
            )
            if got < 0:
                return None
            if got:
                chunks.append(buf[:got])
                total += int(got)
            if got < want:
                break
        if not chunks:
            return None
        frames = chunks[0] if len(chunks) == 1 else np.concatenate(chunks, axis=0)

        if max_res > 0 and max(frames.shape[1], frames.shape[2]) > max_res:
            import cv2

            from video_depth_anything_tpu.io.video import ensure_even

            scale = max_res / max(frames.shape[1], frames.shape[2])
            rw = ensure_even(round(frames.shape[2] * scale))
            rh = ensure_even(round(frames.shape[1] * scale))
            frames = np.stack(
                [cv2.resize(f, (rw, rh)) for f in frames], axis=0
            )
        return frames, out_fps
    finally:
        lib.vda_video_close(handle)
