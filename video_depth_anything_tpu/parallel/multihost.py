"""Multi-host bring-up and host-level work distribution.

Net-new vs the reference (which is single-GPU, SURVEY.md §2.6): standard
TPU-pod process bootstrap via ``jax.distributed.initialize`` plus the
host-level sharding scheme for long-video inference — each host decodes and
preprocesses only its contiguous span of frame windows (DCN carries only
window boundaries and per-window depth outputs; ICI carries everything
inside the jit'd program).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize the multi-host JAX runtime; returns (process_id,
    num_processes).  On single-host (no coordinator), this is a no-op
    returning (0, 1)."""
    import jax

    if coordinator_address is None and num_processes in (None, 1):
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax as _jax

    return _jax.process_index(), _jax.process_count()


@dataclasses.dataclass(frozen=True)
class HostWindowSpan:
    """The contiguous window range a host owns, plus the frame range it must
    decode (windows reference earlier frames through the keyframe splice, so
    the decode span starts at the anchor frame 0's window chain)."""

    window_start: int
    window_stop: int
    frame_start: int
    frame_stop: int


def host_window_spans(n_frames: int, n_hosts: int) -> list:
    """Partition a video's windows across hosts.

    Window w's input indices only reference frames ≤ w·step + 31 and — via
    the recursive keyframe splice — frames of earlier windows down to frame
    0 for slot 0 (``video_depth.py:364``, slot 0 is pinned to the global
    first frame).  Each host therefore decodes [0-anchored slot-0 frame] +
    its own span; in practice slot 0 is always global frame 0 and slots 1..9
    reach back at most ``OVERLAP·n`` frames, so hosts decode from
    ``max(0, start·step − reachback)``.
    """
    from video_depth_anything_tpu.config import INFER_LEN, OVERLAP
    from video_depth_anything_tpu.inference.pipeline import (
        num_windows,
        padded_length,
        window_frame_indices,
    )

    step = INFER_LEN - OVERLAP
    n_win = num_windows(n_frames)
    idx = window_frame_indices(n_frames)
    bounds = np.linspace(0, n_win, n_hosts + 1).astype(int)
    spans = []
    for h in range(n_hosts):
        a, b = int(bounds[h]), int(bounds[h + 1])
        if a == b:
            spans.append(HostWindowSpan(a, b, 0, 0))
            continue
        used = idx[a:b]
        spans.append(
            HostWindowSpan(
                a,
                b,
                int(used.min()),
                min(int(used.max()) + 1, padded_length(n_frames)),
            )
        )
    return spans


class MultiHostVideoDepthPipeline:
    """Host-sharded long-video inference over a multi-process JAX runtime.

    Net-new vs the reference (single-GPU, SURVEY.md §2.6); this is the
    SURVEY §7 step-6 north star: per-host video shards over DCN.  Each
    process decodes and preprocesses ONLY its ``host_window_spans`` span,
    runs those windows through the process-local window forward (its own
    chip(s)), and the per-window depths are exchanged with one
    ``process_allgather`` — after which every host runs the (tiny,
    deterministic) sequential stitch and holds the full result.  DCN
    carries only the per-window depth maps; everything inside a window
    stays on the host's own ICI domain.

    The per-window forward is bit-identical to the single-process
    ``VideoDepthPipeline`` (same jit program, same splice-resolved inputs),
    so the gathered stitch input — and therefore the stitched video — is
    bit-for-bit the single-process output (pinned by
    ``tests/test_multihost.py::test_two_process_e2e_matches_single``).
    """

    def __init__(
        self,
        model,
        input_size: int = 518,
        shape_bucket=None,
        window_batch=None,
        process_id: Optional[int] = None,
        num_processes: Optional[int] = None,
        data_parallel: bool = False,
        model_parallel: int = 1,
        host_upsample=None,
    ):
        """``data_parallel``: shard each host's windows over its own
        chips (a mesh of ``jax.local_devices()`` — the two-level layout of
        a real pod: windows over DCN hosts, then over each host's local
        ICI domain).  ``model_parallel=N``: additionally shard the
        ViT/motion-FF weights Megatron-style over ``model:N`` of each
        host's local mesh — the right layout for vitl on a pod with
        multi-chip hosts (windows over DCN, TP collectives riding each
        host's own ICI, never DCN)."""
        import jax

        from video_depth_anything_tpu.inference.pipeline import (
            VideoDepthPipeline,
        )

        n_local = len(jax.local_devices())
        if model_parallel > 1 and n_local % model_parallel:
            raise ValueError(
                f"model_parallel={model_parallel} does not divide the "
                f"{n_local} local devices of this host"
            )
        if (data_parallel or model_parallel > 1) and n_local > 1:
            from video_depth_anything_tpu.parallel.data_parallel import (
                DataParallelVideoDepthPipeline,
            )
            from video_depth_anything_tpu.parallel.mesh import create_mesh

            self._local = DataParallelVideoDepthPipeline(
                model, input_size, shape_bucket=shape_bucket,
                mesh=create_mesh(
                    devices=jax.local_devices(), model=model_parallel
                ),
                host_upsample=host_upsample,
            )
        else:
            self._local = VideoDepthPipeline(
                model, input_size, shape_bucket=shape_bucket,
                window_batch=window_batch, host_upsample=host_upsample,
            )
        self.model = model
        self.input_size = input_size
        self.pid = jax.process_index() if process_id is None else process_id
        self.n_hosts = (
            jax.process_count() if num_processes is None else num_processes
        )

    def infer_video_depth(
        self,
        n_frames: int,
        decode_range,
        target_fps: float = -1,
        skip_tmp_block: bool = False,
        progress: bool = False,
    ):
        """``decode_range(a, b) -> uint8 (b−a, H, W, 3)`` returns sampled
        frames ``[a, b)`` of the video (every host can decode any range —
        each is asked only for its own span).  ``n_frames`` is the total
        sampled frame count.  Returns (depth ``(n_frames, H, W)`` fp32,
        target_fps) — fully replicated on every host."""
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        from video_depth_anything_tpu.inference.pipeline import (
            num_windows,
            stitch_windows,
            window_frame_indices,
        )
        from video_depth_anything_tpu.utils.transform import (
            preprocess_frames,
        )

        spans = host_window_spans(n_frames, self.n_hosts)
        span = spans[self.pid]
        idx = window_frame_indices(n_frames)
        n_win = num_windows(n_frames)
        max_local = max(s.window_stop - s.window_start for s in spans)

        # -- local decode + preprocess (only this host's frame range) -------
        if span.window_stop > span.window_start:
            real_stop = min(span.frame_stop, n_frames)
            frames = decode_range(span.frame_start, real_stop)
        else:
            frames = decode_range(0, 1)  # shape probe for the exchange
        fh, fw = frames.shape[1:3]
        pre = preprocess_frames(
            frames, self.input_size, self._local._target_hw(fh, fw)
        )
        if span.frame_stop > span.frame_start + len(frames):
            # global tail padding with last-frame copies (ref
            # video_depth.py:351-354) — only the final host's span reaches
            # past n_frames, and its last decoded frame IS the global last
            pre = np.concatenate(
                [pre]
                + [pre[-1:]] * (span.frame_stop - span.frame_start - len(frames))
            )

        # -- local window forwards (same jit program as single-host; DP
        # variant shards them over this host's own devices) -----------------
        local_depths = []
        if span.window_stop > span.window_start:
            local_idx = idx[span.window_start : span.window_stop] - span.frame_start
            local_depths = self._local.compute_window_depths(
                pre, local_idx, fh, fw, skip_tmp_block=skip_tmp_block,
                progress=progress and self.pid == 0,
                desc=f"host {self.pid}/{self.n_hosts} windows",
            )

        # -- one DCN exchange: (n_hosts, max_local, T, fh, fw) fp32 ---------
        from video_depth_anything_tpu.config import INFER_LEN

        buf = np.zeros((max_local, INFER_LEN, fh, fw), np.float32)
        if local_depths:
            buf[: len(local_depths)] = np.stack(local_depths)
        gathered = np.asarray(multihost_utils.process_allgather(buf))

        window_depths = []
        for h, s in enumerate(spans):
            for w in range(s.window_stop - s.window_start):
                window_depths.append(gathered[h, w])
        assert len(window_depths) == n_win
        return stitch_windows(window_depths, n_frames), target_fps
