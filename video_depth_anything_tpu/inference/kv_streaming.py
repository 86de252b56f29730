"""KV-cache streaming inference — O(1) work per frame.

The working end-to-end equivalent of the reference's experimental
cross-attention streaming head (``DPTHeadTemporalCrossAtt``,
``video_depth_anything/dpt_temporal.py:263-343`` +
``motion_module/motion_module.py:275-288``), with its two defects fixed:

* the value cache stores VALUES (the reference concatenates keys into
  ``computed_v``, ``motion_module.py:281``);
* caches are position-free — APE slots are assigned at attend time over
  the current window, so cached frames keep correct *relative* positions
  as the window slides (the reference bakes stale absolute positions in).

Versus the feature-cache mode (``inference/streaming.py``), which re-runs
the 32-frame motion modules + refinenets every step, each KV step computes
only the newest frame everywhere: encoder (1 frame) → level features →
motion modules as single-query attention over per-module K/V ring caches →
refinenets (1 frame) → depth.  The trade: cached frames' hidden states are
frozen from when they were newest (no keyframe schedule, no per-frame
realignment) — the same semantics the reference variant sketches.

Warmup = one batch window over the first 32 frames (producing their depths
and seeding all caches), matching ``warmup=True`` behavior of the
feature-cache mode but with no warmup frames dropped.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_depth_anything_tpu.utils.device import start_host_transfer
from video_depth_anything_tpu.utils.transform import preprocess_frames


class KVStreamingPipeline:
    """Streaming inference with per-motion-module K/V ring caches."""

    def __init__(self, model, input_size: int = 518, inference_length: int = 32):
        self.model = model
        self.input_size = input_size
        self.L = inference_length

    @functools.cached_property
    def _start_fn(self):
        module = self.model.module

        @functools.partial(
            jax.jit, static_argnames=("skip_tmp_block", "out_hw")
        )
        def start(params, x, skip_tmp_block=False, out_hw=None):
            depth, caches = module.apply(
                {"params": params},
                x,
                skip_tmp_block=skip_tmp_block,
                method="streaming_kv_start",
            )
            depth = _resize_out(depth, out_hw)
            # drop the oldest frame: the ring caches hold L−1 entries and
            # each step appends the new frame
            caches = jax.tree.map(lambda c: c[:, 1:], caches)
            return depth, caches

        return start

    @functools.cached_property
    def _step_fn(self):
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw"),
            donate_argnums=(2,),
        )
        def step(params, x, caches, skip_tmp_block=False, out_hw=None):
            depth, caches = module.apply(
                {"params": params},
                x,
                caches,
                skip_tmp_block=skip_tmp_block,
                method="streaming_kv_step",
            )
            return _resize_out(depth[:, None], out_hw)[:, 0], caches

        return step

    def infer(
        self,
        frames: np.ndarray,
        target_fps: float = -1,
        skip_tmp_block: bool = False,
        progress: bool = False,
    ) -> Tuple[np.ndarray, float]:
        org_len, fh, fw = frames.shape[:3]
        L = self.L
        params = self.model.params
        dtype = self.model.dtype

        pre = preprocess_frames(frames, self.input_size)

        # warmup window: pad short videos with the last frame (the batch
        # pipeline's tail-padding quirk, ref video_depth.py:353-354)
        n_warm = min(L, org_len)
        warm = pre[:n_warm]
        if n_warm < L:
            warm = np.concatenate(
                [warm, np.repeat(warm[-1:], L - n_warm, axis=0)], axis=0
            )
        depth0, caches = self._start_fn(
            params,
            jnp.asarray(warm[None], dtype=dtype),
            skip_tmp_block=skip_tmp_block,
            out_hw=(fh, fw),
        )
        depth_list: List[np.ndarray] = list(
            np.asarray(depth0[0], dtype=np.float32)[:n_warm]
        )

        it = range(L, org_len)
        if progress:
            from tqdm import tqdm

            it = tqdm(it, desc="frames (kv)")

        pending: List[jnp.ndarray] = []
        for i in it:
            x = jnp.asarray(pre[i][None], dtype=dtype)
            depth, caches = self._step_fn(
                params,
                x,
                caches,
                skip_tmp_block=skip_tmp_block,
                out_hw=(fh, fw),
            )
            # one-frame lag: this frame's D2H overlaps the next dispatch
            # (transfer starts NOW, not at the np.asarray drain)
            pending.append(start_host_transfer(depth))
            if len(pending) > 1:
                depth_list.append(
                    np.asarray(pending.pop(0), dtype=np.float32)[0]
                )
        while pending:
            depth_list.append(np.asarray(pending.pop(0), dtype=np.float32)[0])

        return np.stack(depth_list, axis=0), target_fps


def _resize_out(depth: jnp.ndarray, out_hw):
    """(B, T, h, w) model-resolution depth → output resolution (fp32
    interpolation arithmetic, align_corners bilinear — ops/resize.py)."""
    if out_hw is None or tuple(depth.shape[2:]) == tuple(out_hw):
        return depth
    from video_depth_anything_tpu.ops.resize import bilinear_resize

    b, t = depth.shape[:2]
    d = depth.reshape((b * t,) + depth.shape[2:] + (1,)).astype(jnp.float32)
    d = bilinear_resize(d, out_hw[0], out_hw[1])
    return d[..., 0].reshape((b, t) + tuple(out_hw))
