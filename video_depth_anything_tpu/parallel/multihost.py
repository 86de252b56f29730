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
