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

from video_depth_anything_tpu.utils.device import start_host_transfer, transfer_cast
from video_depth_anything_tpu.utils.transform import preprocess_frames


class KVStreamingPipeline:
    """Streaming inference with per-motion-module K/V ring caches.

    ``align_each_new_frame``: per-frame scale/shift realignment — the
    KV-mode equivalent of the reference's streaming realignment
    (``video_depth.py:303-317``).  Each step re-predicts the pinned anchor
    frame (global frame 0, whose K/V stay in cache slot 0 forever — the
    KV translation of the feature-cache mode's ``tmp[0] = 0``) alongside
    the newest frame, fits (s, t) between the anchor's fresh prediction
    and its stored warmup depth, and emits ``new·s + t``.  Unlike the
    feature-cache align mode the fit runs ON DEVICE inside the step
    program (``compute_scale_and_shift_jax``), so there is no per-frame
    host feedback and the D2H-overlap pipelining is preserved.  Cost: one
    extra head pass per step (the anchor's encoder features are cached —
    no extra encoder work)."""

    def __init__(
        self,
        model,
        input_size: int = 518,
        inference_length: int = 32,
        align_each_new_frame: bool = False,
        stream_chunk: int = 1,
        model_parallel: int = 1,
        host_upsample=None,
    ):
        self.model = model
        self.input_size = input_size
        self.L = inference_length
        self.align = align_each_new_frame
        # host_upsample (see VideoDepthPipeline): emit model-resolution
        # depth and run the final align-corners upsample on the host —
        # shrinks the per-frame D2H by the source/model area ratio, the
        # binding wall of streaming e2e.  Plain mode only: the aligned
        # step's in-jit (s, t) fit consumes output-resolution maps
        # (reference semantics, ``video_depth.py:303-317``), so align mode
        # keeps the device resize.
        if host_upsample is None:
            import os

            host_upsample = os.environ.get("VDA_HOST_UPSAMPLE", "0") == "1"
        self.host_upsample = bool(host_upsample) and not self.align
        # K steady frames per dispatch: encoder batched over the chunk, the
        # cache-sequential head scanned K steps inside ONE program
        # (lax.scan) — same math as K per-frame steps at 1/K the dispatch
        # overhead.  The per-frame KV step is dispatch-bound e2e (~28 ms
        # host roundtrip vs a ~6 ms device step, docs/PERFORMANCE.md).
        self.chunk = max(1, int(stream_chunk))
        # Tensor-parallel streaming: the ViT/motion-FF weights shard
        # Megatron-style over a ('data':1, 'model':N) mesh (same TP_RULES
        # as the window pipeline) and GSPMD inserts the per-block ICI
        # collectives inside the step programs; K/V caches and activations
        # get their layouts propagated from the param shardings.  A chip
        # count that cannot batch windows (streaming is sequential) can
        # still split the model.
        self.model_parallel = int(model_parallel)
        self._mesh = None
        if self.model_parallel > 1:
            from video_depth_anything_tpu.parallel.mesh import tp_mesh

            self._mesh = tp_mesh(self.model_parallel)

    def _dev(self, x):
        """Replicate an input over the TP mesh (no-op single-chip)."""
        if self._mesh is None:
            return x
        from video_depth_anything_tpu.parallel.mesh import replicate

        return replicate(x, self._mesh)

    @functools.cached_property
    def _params(self):
        if self._mesh is None:
            return self.model.params
        from video_depth_anything_tpu.parallel.mesh import shard_params

        return shard_params(self.model.params, self._mesh)

    @functools.cached_property
    def _start_fn(self):
        module = self.model.module

        @functools.partial(
            jax.jit, static_argnames=("skip_tmp_block", "out_hw", "pin_anchor")
        )
        def start(params, x, skip_tmp_block=False, out_hw=None, pin_anchor=False):
            depth, caches = module.apply(
                {"params": params},
                x,
                skip_tmp_block=skip_tmp_block,
                method="streaming_kv_start",
            )
            depth = _resize_out(depth, out_hw)
            if not pin_anchor:
                # non-align warmup depths are pure emission — honor the
                # transfer dtype (the L-frame warmup block is the single
                # largest D2H).  Align mode stays fp32: row 0 becomes the
                # ref_anchor every later fit consumes.
                depth = transfer_cast(depth)
            # the ring caches hold L−1 entries and each step appends the new
            # frame: drop the oldest — or, pinned (realignment mode), drop
            # frame 1 so slot 0 keeps the global first frame forever
            if pin_anchor:
                caches = jax.tree.map(
                    lambda c: jnp.concatenate([c[:, :1], c[:, 2:]], axis=1),
                    caches,
                )
            else:
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
            return transfer_cast(_resize_out(depth[:, None], out_hw)[:, 0]), caches

        return step

    @functools.cached_property
    def _levels_fn(self):
        module = self.model.module

        @jax.jit
        def levels(params, x):
            return module.apply(
                {"params": params}, x, method="encode_level_features"
            )

        return levels

    @functools.cached_property
    def _aligned_step_fn(self):
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw"),
            donate_argnums=(2,),
        )
        def step(
            params, x, caches, anchor_levels, ref_anchor,
            skip_tmp_block=False, out_hw=None,
        ):
            from video_depth_anything_tpu.ops.scale_shift import (
                compute_scale_and_shift_jax,
            )

            depth, caches = module.apply(
                {"params": params},
                x,
                caches,
                skip_tmp_block=skip_tmp_block,
                anchor_levels=anchor_levels,
                method="streaming_kv_step",
            )
            d = _resize_out(depth[None], out_hw)[0]  # (2, fh, fw) fp32
            s, t = compute_scale_and_shift_jax(d[0], ref_anchor)
            # same aligned-output arithmetic as the feature-cache mode
            # (inference/streaming.py: depth_list.append(cur*s + t))
            return transfer_cast((d[1] * s + t)[None]), caches, s, t

        return step

    @functools.cached_property
    def _chunk_step_fn(self):
        """K steady KV steps in one device program: batched encoder +
        ``lax.scan`` over the cache-sequential head steps.  Identical math
        to K ``_step_fn`` calls (pinned by
        ``tests/test_kv_streaming.py::test_chunked_matches_per_frame``)."""
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw"),
            donate_argnums=(2,),
        )
        def chunk_step(params, xs, caches, skip_tmp_block=False, out_hw=None):
            levels = module.apply(
                {"params": params}, xs, method="encode_level_features"
            )

            def body(carry, lv):
                depth, new_caches = module.apply(
                    {"params": params},
                    jax.tree.map(lambda a: a[None], lv),
                    carry,
                    skip_tmp_block=skip_tmp_block,
                    method="streaming_kv_head_step",
                )
                return new_caches, depth[0]

            caches, depths = jax.lax.scan(body, caches, levels)
            return transfer_cast(_resize_out(depths[None], out_hw)[0]), caches

        return chunk_step

    @functools.cached_property
    def _aligned_chunk_step_fn(self):
        """Chunked variant of ``_aligned_step_fn``.  The scan threads only
        the KV caches — the (s, t) fits are all against the fixed warmup
        anchor, so they are independent per frame and run batched after the
        scan (same arithmetic as the per-frame path)."""
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw"),
            donate_argnums=(2,),
        )
        def chunk_step(
            params, xs, caches, anchor_levels, ref_anchor,
            skip_tmp_block=False, out_hw=None,
        ):
            from video_depth_anything_tpu.ops.scale_shift import (
                compute_scale_and_shift_jax,
            )

            levels = module.apply(
                {"params": params}, xs, method="encode_level_features"
            )

            def body(carry, lv):
                depth, new_caches = module.apply(
                    {"params": params},
                    jax.tree.map(lambda a: a[None], lv),
                    carry,
                    skip_tmp_block=skip_tmp_block,
                    anchor_levels=anchor_levels,
                    method="streaming_kv_head_step",
                )
                return new_caches, depth  # (2, h, w): [anchor, newest]

            caches, depths = jax.lax.scan(body, caches, levels)
            d = _resize_out(depths, out_hw)  # (K, 2, fh, fw) fp32

            def fit(pair):
                s, t = compute_scale_and_shift_jax(pair[0], ref_anchor)
                return pair[1] * s + t

            return transfer_cast(jax.vmap(fit)(d)), caches

        return chunk_step

    def infer(
        self,
        frames: np.ndarray,
        target_fps: float = -1,
        skip_tmp_block: bool = False,
        progress: bool = False,
    ) -> Tuple[np.ndarray, float]:
        org_len, fh, fw = frames.shape[:3]
        L = self.L
        params = self._params
        dtype = self.model.dtype

        pre = preprocess_frames(frames, self.input_size)
        # host_upsample: device programs emit model-res fp32 depth
        # (out_hw=None); the host resize runs in the drain
        out_hw_dev = None if self.host_upsample else (fh, fw)

        def to_host_res(d: np.ndarray) -> np.ndarray:
            if not self.host_upsample:
                return d
            from video_depth_anything_tpu.ops.resize import bilinear_resize_np

            return bilinear_resize_np(d, fh, fw)

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
            self._dev(jnp.asarray(warm[None], dtype=dtype)),
            skip_tmp_block=skip_tmp_block,
            out_hw=(fh, fw) if self.align else out_hw_dev,
            pin_anchor=self.align,
        )
        depth_list: List[np.ndarray] = list(
            to_host_res(np.asarray(depth0[0], dtype=np.float32)[:n_warm])
        )

        anchor_levels = ref_anchor = None
        if self.align:
            # anchor's pre-motion level features are pure per-frame encoder
            # functions — computed once, reused by every aligned step
            anchor_levels = self._levels_fn(
                params, self._dev(jnp.asarray(warm[:1], dtype=dtype))
            )
            # the realignment reference stays the warmup prediction forever
            # (the reference pins ref frame 0 the same way,
            # video_depth.py:409-413 / use_feature_idx[...][0] = 0)
            ref_anchor = depth0[0, 0]

        bar = None
        if progress:
            from tqdm import tqdm

            bar = tqdm(total=max(0, org_len - L), desc="frames (kv)")

        pending: List[jnp.ndarray] = []

        def drain(force=False):
            while pending and (force or len(pending) > 1):
                d = to_host_res(np.asarray(pending.pop(0), dtype=np.float32))
                depth_list.extend(d[j] for j in range(d.shape[0]))

        i = L
        while i < org_len:
            if self.chunk > 1 and org_len - i >= self.chunk:
                xs = self._dev(jnp.asarray(pre[i : i + self.chunk], dtype=dtype))
                if self.align:
                    depth, caches = self._aligned_chunk_step_fn(
                        params, xs, caches, anchor_levels, ref_anchor,
                        skip_tmp_block=skip_tmp_block, out_hw=(fh, fw),
                    )
                else:
                    depth, caches = self._chunk_step_fn(
                        params, xs, caches,
                        skip_tmp_block=skip_tmp_block, out_hw=out_hw_dev,
                    )
                n_done = self.chunk
            else:
                x = self._dev(jnp.asarray(pre[i][None], dtype=dtype))
                if self.align:
                    d1, caches, _, _ = self._aligned_step_fn(
                        params, x, caches, anchor_levels, ref_anchor,
                        skip_tmp_block=skip_tmp_block, out_hw=(fh, fw),
                    )
                else:
                    d1, caches = self._step_fn(
                        params, x, caches,
                        skip_tmp_block=skip_tmp_block, out_hw=out_hw_dev,
                    )
                depth, n_done = d1, 1
            # one-frame lag: this dispatch's D2H overlaps the next dispatch
            # (transfer starts NOW, not at the np.asarray drain)
            pending.append(start_host_transfer(depth))
            drain()
            i += n_done
            if bar is not None:
                bar.update(n_done)
        drain(force=True)
        if bar is not None:
            bar.close()

        return np.stack(depth_list, axis=0), target_fps


def _resize_out(depth: jnp.ndarray, out_hw):
    """(B, T, h, w) model-resolution depth → output resolution (fp32
    interpolation arithmetic, align_corners bilinear — ops/resize.py).
    ``out_hw=None`` (host-upsample mode) emits model resolution — cast to
    fp32 so the emitted maps match the device-resize path's precision
    (the model computes depth in its compute dtype, e.g. bf16)."""
    if out_hw is None or tuple(depth.shape[2:]) == tuple(out_hw):
        return depth.astype(jnp.float32)
    from video_depth_anything_tpu.ops.resize import bilinear_resize

    b, t = depth.shape[:2]
    d = depth.reshape((b * t,) + depth.shape[2:] + (1,)).astype(jnp.float32)
    d = bilinear_resize(d, out_hw[0], out_hw[1])
    return d[..., 0].reshape((b, t) + tuple(out_hw))
