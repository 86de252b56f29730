"""Host-side video decode/encode.

Mirrors the reference I/O surface (``utils/dc_utils.py:19-89``): frame
reading with max-resolution downscale and fps-ratio striding, and depth
video writing with inferno/Spectral colormap over a global min-max
normalization.  decord and imageio-ffmpeg are not available in this image;
decode uses OpenCV (the reference's own fallback, ``dc_utils.py:39-67``)
with decord's sampled-frame-limit semantics, and encode uses cv2
``VideoWriter`` (mp4v).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def ensure_even(value: int) -> int:
    return value if value % 2 == 0 else value + 1


def read_video_frames(
    video_path: str,
    process_length: int = -1,
    target_fps: float = -1,
    max_res: int = -1,
) -> Tuple[np.ndarray, float]:
    """Decode RGB frames ``(N, H, W, 3) uint8``; returns (frames, fps).

    ``process_length`` limits the number of *sampled* frames (decord-path
    semantics, ``dc_utils.py:30-33``); ``target_fps`` selects every
    ``round(src_fps/target_fps)``-th frame; ``max_res`` downscales so the
    longer side is at most that many (even) pixels.

    Decodes through the native C++ stage (``native/decode.cpp``, libav +
    swscale with in-loop striding) unless ``VDA_NATIVE_DECODE=0``; this cv2
    loop is the parity fallback (the reference's own fallback decoder,
    ``dc_utils.py:39-67``).
    """
    import os

    if os.environ.get("VDA_NATIVE_DECODE", "1") != "0":
        from video_depth_anything_tpu.io.native_video import (
            read_video_frames_native,
        )

        out = read_video_frames_native(
            video_path, process_length, target_fps, max_res
        )
        if out is not None:
            return out

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))

    resize_to = None
    if max_res > 0 and max(height, width) > max_res:
        scale = max_res / max(height, width)
        resize_to = (ensure_even(round(width * scale)), ensure_even(round(height * scale)))

    fps = src_fps if target_fps <= 0 else target_fps
    stride = max(round(src_fps / fps), 1)

    frames = []
    idx = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if idx % stride == 0:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if resize_to is not None:
                frame = cv2.resize(frame, resize_to)
            frames.append(frame)
            if 0 < process_length <= len(frames):
                break
        idx += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {video_path}")
    return np.stack(frames, axis=0), fps


def _open_sampling(video_path: str, target_fps: float):
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    fps = src_fps if target_fps <= 0 else target_fps
    stride = max(round(src_fps / fps), 1)
    return cap, fps, stride


def count_video_frames(
    video_path: str, process_length: int = -1, target_fps: float = -1
) -> Tuple[int, float]:
    """(sampled frame count, fps) without decoding — the multi-host driver
    needs the global count to partition windows before any host decodes
    (``parallel/multihost.py``).  Uses the container's frame count header
    (CAP_PROP_FRAME_COUNT; exact for the mp4/avi files cv2 writes and
    ffmpeg-muxed files generally).

    Failure mode (documented for multi-host runs): for VFR streams or
    codecs whose header count is an estimate, an over-reporting header
    surfaces as a ``ValueError`` from ``read_video_frame_range`` on
    whichever host draws the short range — safe but late (after all hosts
    spent decode/compute).  ``VDA_VALIDATE_FRAME_COUNT=1`` makes this
    function verify the header by grab()-counting the stream first (one
    cheap decode pass, no color conversion) so bad containers fail fast
    on every host before any compute."""
    import os

    cap, fps, stride = _open_sampling(video_path, target_fps)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if os.environ.get("VDA_VALIDATE_FRAME_COUNT", "0") == "1":
        counted = 0
        while cap.grab():
            counted += 1
        if counted != total:
            cap.release()
            raise ValueError(
                f"container header reports {total} frames but the stream "
                f"holds {counted}: {video_path} (VFR/estimated header; "
                "multi-host spans would be mispartitioned)"
            )
    cap.release()
    if total <= 0:
        raise ValueError(f"container reports no frame count: {video_path}")
    n = (total + stride - 1) // stride
    if process_length > 0:
        n = min(n, process_length)
    return n, fps


def read_video_frame_range(
    video_path: str,
    start: int,
    stop: int,
    target_fps: float = -1,
    max_res: int = -1,
) -> np.ndarray:
    """Decode sampled frames ``[start, stop)`` only — the per-host decode
    for multi-host inference (each host reads just its window span's
    frames).  Seeks to the range when the container supports exact seeks
    (verified via position readback), else grab()-skips from the head
    (still no color-convert/retrieve cost for skipped frames).  Sampling,
    color, and resize semantics identical to ``read_video_frames`` — the
    result equals ``read_video_frames(...)[0][start:stop]`` bit-for-bit
    (pinned by tests/test_multihost.py)."""
    cap, _, stride = _open_sampling(video_path, target_fps)
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    resize_to = None
    if max_res > 0 and max(height, width) > max_res:
        scale = max_res / max(height, width)
        resize_to = (
            ensure_even(round(width * scale)),
            ensure_even(round(height * scale)),
        )

    raw_start = start * stride
    pos = 0
    if raw_start:
        # OpenCV's ffmpeg backend can report the *requested* position even
        # when the seek was only keyframe/timestamp-approximate (B-frame
        # H.264 with imperfect timestamps), so the readback check below is
        # necessary but not sufficient.  For untrusted containers set
        # VDA_SEEK_MODE=grab to force the frame-exact sequential grab()-skip
        # path (still skips color-convert/retrieve for skipped frames).
        import os

        seek_mode = os.environ.get("VDA_SEEK_MODE", "auto")
        if (
            seek_mode != "grab"
            and cap.set(cv2.CAP_PROP_POS_FRAMES, raw_start)
            and int(cap.get(cv2.CAP_PROP_POS_FRAMES)) == raw_start
        ):
            pos = raw_start
        else:
            cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
            while pos < raw_start and cap.grab():
                pos += 1

    frames = []
    while len(frames) < stop - start:
        ret, frame = cap.read()
        if not ret:
            break
        if (pos - raw_start) % stride == 0:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if resize_to is not None:
                frame = cv2.resize(frame, resize_to)
            frames.append(frame)
        pos += 1
    cap.release()
    if len(frames) < stop - start:
        raise ValueError(
            f"decoded {len(frames)} frames for range [{start},{stop}) "
            f"of {video_path}"
        )
    return np.stack(frames, axis=0)


def colorize_depth(
    depths: np.ndarray, grayscale: bool = False, spectral: bool = False
) -> np.ndarray:
    """Depth stack → uint8 RGB frames with global min-max normalization
    (ref ``dc_utils.py:74-84``)."""
    import matplotlib

    d_min, d_max = float(depths.min()), float(depths.max())
    denom = (d_max - d_min) or 1.0
    norm = ((depths - d_min) / denom * 255.0).astype(np.uint8)
    if grayscale:
        return np.repeat(norm[..., None], 3, axis=-1)
    cmap_name = "Spectral" if spectral else "inferno"
    cmap = matplotlib.colormaps[cmap_name]
    lut = (np.asarray(cmap(np.arange(256) / 255.0))[:, :3] * 255).astype(np.uint8)
    return lut[norm]


def save_video(
    frames: np.ndarray,
    output_path: str,
    fps: float = 10,
    is_depths: bool = False,
    grayscale: bool = False,
    spectral: bool = False,
) -> None:
    """Write RGB uint8 or depth frames to an mp4 (cv2 mp4v)."""
    if is_depths:
        frames = colorize_depth(frames, grayscale=grayscale, spectral=spectral)
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise RuntimeError(f"cannot open video writer for {output_path}")
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def write_tiff_stack(path: str, frames: np.ndarray) -> None:
    """Write a float32 [N, H, W] stack as a multi-page TIFF.

    Counterpart of the reference's ``--save_tiff`` output (``run.py:165-166``,
    consumed by its comparative pipeline ``calculate_metrics.py:141-163``).
    tifffile is not in this image; PIL mode-"F" pages round-trip float32
    bit-exactly (pinned by tests/test_cli.py).
    """
    from PIL import Image

    frames = np.ascontiguousarray(frames, dtype=np.float32)
    if frames.shape[0] == 0:
        # reachable via run.py --process_single_image --save_tiff on a video
        # shorter than inference_length (streaming warmup yields no depths)
        raise ValueError("write_tiff_stack: empty depth stack (0 frames)")
    pages = [Image.fromarray(f, mode="F") for f in frames]
    pages[0].save(path, save_all=True, append_images=pages[1:])


def read_tiff_stack(path: str) -> np.ndarray:
    """Read a multi-page float TIFF back as a float32 [N, H, W] array."""
    from PIL import Image

    with Image.open(path) as im:
        pages = []
        for i in range(im.n_frames):
            im.seek(i)
            pages.append(np.array(im, dtype=np.float32))
        return np.stack(pages)
