"""Sliding-window long-video inference.

Re-derivation of the reference algorithm (``video_depth_anything/
video_depth.py:329-417``) in a parallel-friendly form:

* **Window inputs are pure functions of the raw frames.**  The reference
  splices the previous window's KEYFRAMES *inputs* into the next window's
  first OVERLAP slots (``video_depth.py:363-364``).  Since the splice copies
  inputs (not model outputs), the global frame index of every window slot
  can be resolved up front (``window_frame_indices``) — so all windows are
  independent model calls, shardable over a data-parallel mesh axis; the
  reference's serial loop is an artifact of its in-place splice.
* **Stitching is a tiny sequential host pass** over per-window (scale,
  shift) least-squares fits + the 8-frame cross-fade, bit-matching the
  reference math (``video_depth.py:379-415``) including the
  clip-negative-after-affine ordering and the ref frame 0 pinned to the
  very first window forever (``video_depth.py:409-413``).

Per window the device does: 32-frame forward → bilinear (align_corners)
resize to the original video resolution → one D2H of fp32 depth.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_depth_anything_tpu.config import INFER_LEN, INTERP_LEN, KEYFRAMES, OVERLAP
from video_depth_anything_tpu.ops.resize import bilinear_resize
from video_depth_anything_tpu.ops.scale_shift import (
    compute_scale_and_shift,
    interpolation_weights,
)
from video_depth_anything_tpu.utils.device import start_host_transfer
from video_depth_anything_tpu.utils.device import transfer_cast
from video_depth_anything_tpu.utils.transform import preprocess_frames


def num_windows(n_frames: int) -> int:
    step = INFER_LEN - OVERLAP
    return max(1, -(-n_frames // step))


def padded_length(n_frames: int) -> int:
    """Frames needed after tail-padding with last-frame copies
    (ref ``video_depth.py:351-354``)."""
    step = INFER_LEN - OVERLAP
    append = (step - (n_frames % step)) % step + (INFER_LEN - step)
    return n_frames + append


def window_frame_indices(n_frames: int) -> np.ndarray:
    """(n_windows, INFER_LEN) global frame indices (into the padded frame
    array) that each window's input slots hold after keyframe splicing."""
    step = INFER_LEN - OVERLAP
    n_win = num_windows(n_frames)
    out = np.empty((n_win, INFER_LEN), dtype=np.int64)
    out[0] = np.arange(INFER_LEN)
    kf = np.asarray(KEYFRAMES)
    for w in range(1, n_win):
        out[w, :OVERLAP] = out[w - 1][kf]
        out[w, OVERLAP:] = w * step + np.arange(OVERLAP, INFER_LEN)
    return out


def stitch_windows(window_depths: List[np.ndarray], org_len: int) -> np.ndarray:
    """Scale/shift-align consecutive windows and cross-fade overlaps
    (exact reference math, ``video_depth.py:379-415``)."""
    align_len = OVERLAP - INTERP_LEN
    kf_ids = list(KEYFRAMES[:align_len])
    post_w = interpolation_weights(INTERP_LEN)

    aligned: List[np.ndarray] = []
    ref_align: List[np.ndarray] = []
    for w, d in enumerate(window_depths):
        if w == 0:
            aligned.extend(d[i] for i in range(INFER_LEN))
            ref_align = [d[k] for k in kf_ids]
            continue
        curr = np.concatenate([d[i] for i in range(align_len)])
        ref = np.concatenate(ref_align)
        s, t = compute_scale_and_shift(curr, ref)

        pre = aligned[-INTERP_LEN:]
        post = [
            np.maximum(d[i] * s + t, 0.0)
            for i in range(align_len, OVERLAP)
        ]
        aligned[-INTERP_LEN:] = [
            pre[i] * (1.0 - post_w[i]) + post[i] * post_w[i]
            for i in range(INTERP_LEN)
        ]
        for i in range(OVERLAP, INFER_LEN):
            aligned.append(np.maximum(d[i] * s + t, 0.0))
        # ref frame 0 stays the first window's keyframe forever
        # (video_depth.py:409-413); the second ref follows the new window.
        ref_align = [ref_align[0]] + [
            np.maximum(d[k] * s + t, 0.0) for k in kf_ids[1:]
        ]
    return np.stack(aligned[:org_len], axis=0)


class VideoDepthPipeline:
    """End-to-end long-video inference around a ``VDAModel``.

    ``shape_bucket``: snap the model resolution to multiples of this many
    pixels (must be a multiple of 14) to bound recompiles across videos of
    different aspect ratios; ``None`` keeps exact reference sizing.

    ``window_batch``: windows processed per device program.  Window inputs
    are index-resolved and independent (module docstring), so batching them
    is mathematically identical to the serial loop; on the small-channel
    encoders it amortizes the per-kernel-call fixed costs that dominate at
    batch 1 (v5e measured, docs/PERFORMANCE.md: vits 315 → 399 f/s at
    B=4, while compute-saturated vitl gains nothing at B=2).  ``None``
    picks 4 for vits/vitb-class heads and 1 for vitl+."""

    def __init__(
        self, model, input_size: int = 518, shape_bucket=None,
        window_batch: Optional[int] = None,
        host_upsample: Optional[bool] = None,
    ):
        self.model = model
        self.input_size = input_size
        self.shape_bucket = shape_bucket
        if window_batch is None:
            window_batch = 4 if model.cfg.features <= 128 else 1
        self.window_batch = max(1, int(window_batch))
        # host_upsample: the device emits depth at MODEL resolution and the
        # final align-corners upsample to source resolution runs on the
        # host (``ops.resize.bilinear_resize_np`` — same fp32 taps as the
        # device GEMM path).  Shrinks the dominant D2H by the source/model
        # area ratio (720p/518² ≈ 1.9×, 4K ≈ 11×); composes with
        # VDA_TRANSFER_DTYPE=fp16.  Off by default (the device resize
        # rides the MXU for free; use where the host link binds).
        if host_upsample is None:
            import os

            host_upsample = os.environ.get("VDA_HOST_UPSAMPLE", "0") == "1"
        self.host_upsample = bool(host_upsample)

    def _target_hw(self, fh: int, fw: int):
        if self.shape_bucket is None:
            return None
        from video_depth_anything_tpu.utils.transform import bucket_model_size

        return bucket_model_size(fh, fw, self.input_size, self.shape_bucket)

    @functools.cached_property
    def _window_fn(self):
        module = self.model.module

        @functools.partial(
            jax.jit, static_argnames=("out_h", "out_w", "skip_tmp_block")
        )
        def fwd(params, x, out_h, out_w, skip_tmp_block=False):
            depth = module.apply(
                {"params": params}, x, skip_tmp_block=skip_tmp_block
            )  # (B, T, h, w)
            depth = depth[..., None].astype(jnp.float32)
            depth = bilinear_resize(depth, out_h, out_w)[..., 0]
            # optional fp16 D2H (VDA_TRANSFER_DTYPE=fp16): halves the
            # dominant transfer; the host stitch converts back to fp32 —
            # its overlap fits see ~5e-4 relative quantization
            return transfer_cast(depth)  # (B, T, out_h, out_w)

        return fwd

    def _preprocess_pipelined(self, frames: np.ndarray, pad_len: int, target_hw):
        """Producer-thread preprocessing: returns ``(pre, wait_until)`` where
        ``pre`` fills chunk-by-chunk in the background (native C++ resize +
        normalize releases the GIL) and ``wait_until(n)`` blocks until the
        first ``n`` padded frames are ready.  Overlaps the host decode/
        transform cost with device window compute — the reference transforms
        every frame up front before any GPU work (``video_depth.py:336-354``).
        """
        import threading

        from video_depth_anything_tpu.utils.transform import model_size_for

        org_len, fh, fw = frames.shape[:3]
        mh, mw = target_hw or model_size_for(fh, fw, self.input_size)
        pre = np.empty((pad_len, mh, mw, 3), np.float32)
        chunk = INFER_LEN - OVERLAP
        state = {"ready": 0, "err": None}
        cond = threading.Condition()

        def worker():
            try:
                for a in range(0, org_len, chunk):
                    b = min(org_len, a + chunk)
                    pre[a:b] = preprocess_frames(
                        frames[a:b], self.input_size, (mh, mw)
                    )
                    with cond:
                        state["ready"] = b
                        cond.notify_all()
                if pad_len > org_len:
                    pre[org_len:] = pre[org_len - 1]
                with cond:
                    state["ready"] = pad_len
                    cond.notify_all()
            except BaseException as e:  # noqa: BLE001 - repropagated below
                with cond:
                    state["err"] = e
                    cond.notify_all()

        threading.Thread(target=worker, daemon=True).start()

        def wait_until(n: int):
            with cond:
                while state["ready"] < n and state["err"] is None:
                    cond.wait()
                if state["err"] is not None:
                    raise state["err"]

        return pre, wait_until

    def compute_window_depths(
        self,
        pre: np.ndarray,
        idx: np.ndarray,
        fh: int,
        fw: int,
        skip_tmp_block: bool = False,
        progress: bool = False,
        wait_until=None,
        desc: str = "windows",
    ) -> List[np.ndarray]:
        """Run the window forwards for ``idx (n, INFER_LEN)`` over the
        preprocessed frames and return the n per-window depth maps at
        (fh, fw).  Shared by the single-host, multi-host, and (overridden)
        data-parallel paths."""
        # Batch `window_batch` windows per device program (they are
        # independent model calls — see module docstring); the last chunk
        # pads by repeating the final window so one compiled program covers
        # every chunk, and the padded outputs are dropped.
        n_win = idx.shape[0]
        wb = self.window_batch
        idxp = idx
        if n_win % wb:
            idxp = np.concatenate(
                [idx, np.repeat(idx[-1:], (-n_win) % wb, axis=0)], axis=0
            )

        it = range(0, len(idxp), wb)
        if progress:
            from tqdm import tqdm

            it = tqdm(it, desc=f"{desc} (x{wb})")

        # host_upsample: emit at model resolution; the source-resolution
        # upsample happens in drain() after the (smaller) transfer
        dev_h, dev_w = (pre.shape[1], pre.shape[2]) if self.host_upsample \
            else (fh, fw)

        # one-chunk lag between dispatch and D2H so the (large) depth
        # transfer of chunk c overlaps the compute of chunk c+1 — the
        # device executes in order, transfers run alongside.  The lag keeps
        # one extra (wb, T, fh, fw) fp32 buffer alive on-device, so it is
        # disabled for very large frames (≥512 MB per chunk) to avoid
        # raising peak HBM past what the synchronous path needed.
        overlap_d2h = wb * INFER_LEN * dev_h * dev_w * 4 < 512 * 2**20
        window_depths: List[np.ndarray] = []

        def drain(d):
            # fp32 on host regardless of the transfer dtype — the stitch
            # chain (fits, cross-fade) runs full precision
            d = np.asarray(d, dtype=np.float32)
            if self.host_upsample:
                from video_depth_anything_tpu.ops.resize import (
                    bilinear_resize_np,
                )

                d = bilinear_resize_np(d, fh, fw)
            window_depths.extend(d)

        pending = None
        for s in it:
            chunk = idxp[s : s + wb]
            if wait_until is not None:
                wait_until(int(chunk.max()) + 1)
            x = jnp.asarray(pre[chunk], dtype=self.model.dtype)
            d = self._window_fn(
                self.model.params, x, dev_h, dev_w,
                skip_tmp_block=skip_tmp_block,
            )
            if not overlap_d2h:
                drain(d)
                continue
            if pending is not None:
                drain(pending)
            pending = start_host_transfer(d)
        if pending is not None:
            drain(pending)
        return window_depths[:n_win]

    def infer_video_depth(
        self,
        frames: np.ndarray,
        target_fps: float = -1,
        skip_tmp_block: bool = False,
        progress: bool = False,
    ) -> Tuple[np.ndarray, float]:
        """uint8 RGB ``(N, H, W, 3)`` → (depth ``(N, H, W)`` fp32, fps)."""
        org_len, fh, fw = frames.shape[:3]
        pad_len = padded_length(org_len)
        idx = window_frame_indices(org_len)

        pre, wait_until = self._preprocess_pipelined(
            frames, pad_len, self._target_hw(fh, fw)
        )
        window_depths = self.compute_window_depths(
            pre, idx, fh, fw, skip_tmp_block=skip_tmp_block,
            progress=progress, wait_until=wait_until,
        )
        return stitch_windows(window_depths, org_len), target_fps
