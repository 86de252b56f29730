"""Streaming single-frame inference with a keyframe feature cache.

Re-implementation of the fork's experimental streaming mode
(``video_depth_anything/video_depth.py:91-327``): per-frame encoding, a
per-level cache of pre-motion DPT features spanning
``inference_length + max(keyframes) − 1`` frames, a precomputed keyframe
gather schedule, and optional per-frame scale/shift re-alignment against
previously predicted keyframe depths.

TPU-native shape discipline: the cache is a fixed-shape array per level;
each step runs exactly two compiled programs — the warmup encoder step and
the steady streaming step (gather indices are host-resolved into static
arrays; the step program is identical from frame ``L+max_kf`` on, so there
is no recompilation in steady state).

Behavioral quirks preserved from the reference (documented contract):
* without ``align_each_new_frame`` the first ``L−1`` frames produce no
  depth (``video_depth.py:237,321``);
* with it, frame 0 is used for alignment only and dropped from the output
  (``video_depth.py:324-326``);
* ``warmup=False`` is not implemented (``video_depth.py:321-322``).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_depth_anything_tpu.ops.scale_shift import compute_scale_and_shift
from video_depth_anything_tpu.utils.device import start_host_transfer, transfer_cast
from video_depth_anything_tpu.utils.transform import preprocess_frames


def streaming_schedule(
    inference_length: int, keyframe_list: Sequence[int]
) -> Tuple[List[int], List[List[int]], List[List[int]]]:
    """Precompute (static_keyframes, use_feature_idx, align_idx).

    Same arithmetic as the reference's in-loop setup
    (``video_depth.py:148-191``): for each step in the transition phase
    (frame ``L−1`` .. ``L+max_kf−1``) the list of cache slots whose features
    form the attention window, with slot 0 pinned to the first frame and
    keyframe slots redirected per their distance schedule.
    """
    L = inference_length
    kfs = list(keyframe_list)
    max_kf = max(kfs)
    dist = [kf + (L - len(kfs)) for kf in kfs]

    static_kf: List[int] = []
    for i, kf in enumerate(kfs):
        static_kf.append(L - kf if L > kf else i + 1)
    if len(static_kf) != len(set(static_kf)):
        raise ValueError(f"keyframe setup yields duplicate slots: {static_kf}")

    use_feature_idx: List[List[int]] = []
    align_idx: List[List[int]] = []
    for frame_idx in range(L - 1, L + max_kf):
        tmp = list(range(frame_idx - (L - 1), frame_idx))
        tmp[0] = 0  # first frame is always the anchor reference
        aib = [0]
        for i, sk in enumerate(static_kf):
            if sk in tmp:
                aib.append(tmp.index(sk))
            else:
                aib.append(i + 1)
                if frame_idx - dist[i] <= sk:
                    tmp[i + 1] = sk
                else:
                    tmp[i + 1] = sk + (frame_idx - dist[i] - sk)
        use_feature_idx.append(tmp)
        align_idx.append(aib)
    return static_kf, use_feature_idx, align_idx


class StreamingDepthPipeline:
    """Streaming inference around a ``VDAModel``."""

    def __init__(
        self,
        model,
        input_size: int = 518,
        inference_length: int = 32,
        keyframe_list: Tuple[int, ...] = (0, 12),
        align_each_new_frame: bool = False,
        chunk_size: int = 8,
        model_parallel: int = 1,
        ring_dtype: Optional[str] = None,
        host_upsample=None,
    ):
        if inference_length <= len(keyframe_list) + 2:
            raise ValueError("inference_length too small for the keyframe list")
        # host_upsample (see VideoDepthPipeline): emit model-resolution
        # depth, upsample on host after the (smaller) transfer.  Plain mode
        # only — the aligned mode's fits consume output-resolution maps
        # (reference semantics), so align keeps the device resize.
        if host_upsample is None:
            import os as _os2

            host_upsample = _os2.environ.get("VDA_HOST_UPSAMPLE", "0") == "1"
        self.host_upsample = bool(host_upsample) and not align_each_new_frame
        # Storage dtype of the device-resident emitted-depth ring (aligned
        # mode only).  fp32 default preserves exact host-fit parity; fp16 /
        # bf16 halve the ring (≈160 MB at 43 slots / 720p fp32, growing
        # with output resolution) at the cost of quantized (s, t) fit
        # references — emitted depths themselves stay fp32.  A/B drift
        # numbers: docs/PERFORMANCE.md "Reduced-precision aligned ring".
        import os as _os

        ring = ring_dtype or _os.environ.get("VDA_RING_DTYPE", "fp32")
        try:
            self.ring_dtype = {
                "fp32": jnp.float32,
                "fp16": jnp.float16,
                "bf16": jnp.bfloat16,
            }[ring]
        except KeyError:
            raise ValueError(
                f"ring_dtype must be fp32|fp16|bf16, got {ring!r}"
            ) from None
        self.model = model
        self.input_size = input_size
        self.L = inference_length
        self.keyframes = tuple(keyframe_list)
        self.max_kf = max(keyframe_list)
        self.cache_len = self.L + self.max_kf - 1
        self.align = align_each_new_frame
        # Steady-state frames are processed ``chunk_size`` at a time through
        # one device program.  Non-align mode: the cache holds *pre-motion*
        # per-frame features, so consecutive steps have no sequential
        # dependency and batch exactly (one batched program).  Align mode:
        # each step's fit consumes earlier steps' *emitted* depths, so the
        # chunk is a ``lax.scan`` over the cache+ring carry instead
        # (``_aligned_chunk_fn``; requires the device-resident fit —
        # ``VDA_DEVICE_ALIGN=0`` falls back to per-frame host fits).
        # Chunk bound (non-align batched path): ``_steady_indices`` frees
        # physical slot ``phys[1]`` once per frame; after ``cache_len − 2``
        # frames the freed slots start repeating, and
        # ``cache.at[write_slots].set`` with duplicate indices has an
        # unspecified winner in XLA (silent cache corruption).  Clamp
        # instead of erroring — chunking is purely a dispatch-batching
        # detail with identical math at any size.  (The aligned scan
        # writes sequentially and needs no bound; clamped the same for a
        # uniform contract.)
        chunk = max(1, int(chunk_size))
        self.chunk = min(chunk, self.cache_len - 2)
        # Tensor-parallel streaming (same pattern as KVStreamingPipeline):
        # Megatron-sharded weights over ('data':1,'model':N); GSPMD inserts
        # the ICI collectives in the existing step programs.
        self.model_parallel = int(model_parallel)
        self._mesh = None
        if self.model_parallel > 1:
            from video_depth_anything_tpu.parallel.mesh import tp_mesh

            self._mesh = tp_mesh(self.model_parallel)
        (self.static_kf, self.use_feature_idx, self.align_idx) = streaming_schedule(
            inference_length, keyframe_list
        )
        if self.align and max(self.use_feature_idx[0]) > self.L - 2:
            # With a 0 keyframe the first-prediction schedule redirects a slot
            # to position L (beyond the L-1 cached frames).  The reference
            # crashes on this very config (IndexError at dpt_temporal.py:189,
            # gather of pred_depth_idx into the (L-1)-frame cache); refuse it
            # explicitly instead of silently clamping.
            raise ValueError(
                "align_each_new_frame with this keyframe_list references "
                "unfilled cache slots at the first prediction (a latent "
                "crash in the reference as well); use keyframes > 0, e.g. "
                "keyframe_list=(12,)"
            )

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

    # -- jitted pieces ------------------------------------------------------

    @functools.cached_property
    def _encode_fn(self):
        module = self.model.module

        @jax.jit
        def encode(params, x):
            return module.apply(
                {"params": params}, x, method="encode_level_features"
            )

        return encode

    @functools.cached_property
    def _step_fn(self):
        """One fused device program per steady frame: cache gather → encoder
        + head step → align-corners resize → in-place (donated) cache write.

        Keeping everything in a single ``jit`` keeps the feature cache
        device-resident with no per-frame host dispatch chatter (the
        reference re-indexes and shifts its cache tensors in Python every
        frame, ``video_depth.py:238-296``)."""
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw", "cast"),
            donate_argnums=(2,),
        )
        def step(
            params,
            x,
            cache,
            use_idx,
            slot,
            pred_idx=None,
            skip_tmp_block=False,
            out_hw=None,
            cast=False,
        ):
            gathered = tuple(c[use_idx] for c in cache)
            depth, new_feats = module.apply(
                {"params": params},
                x,
                gathered,
                pred_idx=pred_idx,
                skip_tmp_block=skip_tmp_block,
                method="streaming_step",
            )
            if out_hw is not None and out_hw != depth.shape[1:]:
                from video_depth_anything_tpu.ops.resize import bilinear_resize

                depth = bilinear_resize(
                    depth[..., None].astype(jnp.float32), *out_hw
                )[..., 0]
            # out_hw=None (host-upsample mode) emits model res — still fp32
            # (the model computes depth in its compute dtype)
            depth = depth.astype(jnp.float32)
            cache = tuple(
                c.at[slot].set(f[0]) for c, f in zip(cache, new_feats)
            )
            # ``cast``: pure-emission calls (non-align steady) honor the
            # transfer dtype; align-mode calls keep fp32 — the host/ring
            # fits consume these depths
            return (transfer_cast(depth) if cast else depth), cache

        return step

    @functools.cached_property
    def _chunk_fn(self):
        """K steady-state frames per dispatch (see ``streaming_chunk_step``):
        batched encoder + batched K-window head + scatter of the K new
        feature frames into their freed slots, all one device program."""
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw"),
            donate_argnums=(2,),
        )
        def chunk_step(
            params, xs, cache, gather_idx, write_slots,
            skip_tmp_block=False, out_hw=None,
        ):
            depth, new_feats = module.apply(
                {"params": params},
                xs,
                cache,
                gather_idx,
                skip_tmp_block=skip_tmp_block,
                method="streaming_chunk_step",
            )
            if out_hw is not None and out_hw != depth.shape[1:]:
                from video_depth_anything_tpu.ops.resize import bilinear_resize

                depth = bilinear_resize(
                    depth[..., None].astype(jnp.float32), *out_hw
                )[..., 0]
            depth = depth.astype(jnp.float32)
            cache = tuple(
                c.at[write_slots].set(f) for c, f in zip(cache, new_feats)
            )
            return transfer_cast(depth), cache

        return chunk_step

    @functools.cached_property
    def _aligned_chunk_fn(self):
        """K steady ALIGNED steps in one program: batched encoder +
        ``lax.scan`` threading (cache, depth ring) — each step gathers its
        window, predicts keyframes + current, fits (s, t) against the
        ring's emitted depths, emits ``cur·s + t``, and writes both the
        new features and the emitted depth into the freed slot.  Same math
        as K ``_aligned_steady_fn`` dispatches (pinned by
        ``test_streaming_parity.py::test_aligned_chunk_matches_per_frame``)."""
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw"),
            donate_argnums=(2, 3),
        )
        def chunk_step(
            params, xs, cache, dring, use_idx, slots, align_gather,
            pred_idx, skip_tmp_block=False, out_hw=None,
        ):
            from video_depth_anything_tpu.ops.scale_shift import (
                compute_scale_and_shift_jax,
            )

            levels = module.apply(
                {"params": params}, xs, method="encode_level_features"
            )

            def body(carry, x):
                cache, dring = carry
                lv, ui, sl, ag = x
                gathered = tuple(c[ui] for c in cache)
                depth, new_feats = module.apply(
                    {"params": params},
                    jax.tree.map(lambda a: a[None], lv),
                    gathered,
                    pred_idx=pred_idx,
                    skip_tmp_block=skip_tmp_block,
                    method="streaming_head_step",
                )
                if out_hw is not None and out_hw != depth.shape[1:]:
                    from video_depth_anything_tpu.ops.resize import (
                        bilinear_resize,
                    )

                    depth = bilinear_resize(
                        depth[..., None].astype(jnp.float32), *out_hw
                    )[..., 0]
                depth = depth.astype(jnp.float32)
                # ring reads upcast to fp32 for the fit; writes below cast
                # back to the ring dtype (``.at[].set`` casts to the array's
                # dtype), so a reduced-precision ring only quantizes the
                # (s, t) references, never the emitted depths
                s, t = compute_scale_and_shift_jax(
                    depth[:-1], dring[ag].astype(jnp.float32)
                )
                aligned = depth[-1] * s + t
                cache = tuple(
                    c.at[sl].set(f[0]) for c, f in zip(cache, new_feats)
                )
                dring = dring.at[sl].set(aligned.astype(dring.dtype))
                return (cache, dring), aligned

            (cache, dring), out = jax.lax.scan(
                body, (cache, dring), (levels, use_idx, slots, align_gather)
            )
            return transfer_cast(out), cache, dring

        return chunk_step

    def _aligned_steady_indices(self, phys: List[int], k: int):
        """Advance the slot map by ``k`` steady ALIGNED frames; returns
        ``(use_idx (k, L−1), slots (k,), align_gather (k, n_kf), phys)``.
        Unlike ``_steady_indices`` there are no in-chunk redirects — the
        aligned scan threads the cache, so each step's gather sees the
        previous steps' writes directly."""
        virt = self.use_feature_idx[-1]
        aidx = self.align_idx[-1]
        use = np.empty((k, len(virt)), dtype=np.int32)
        slots = np.empty((k,), dtype=np.int32)
        gather = np.empty((k, len(aidx)), dtype=np.int32)
        for j in range(k):
            row = [phys[v] for v in virt]
            use[j] = row
            gather[j] = [row[a] for a in aidx]
            slot = phys[1]
            slots[j] = slot
            phys = [phys[0]] + phys[2:] + [slot]
        return use, slots, gather, phys

    def _steady_indices(self, phys: List[int], k: int):
        """Advance the virtual→physical slot map by ``k`` steady frames.

        Returns ``(gather_idx (k, L−1), write_slots (k,), new phys)``.
        Gather positions ≥ cache_len point at earlier frames of the same
        chunk (their slot was freed and rewritten within the chunk — the
        device reads them from the freshly computed features instead)."""
        virt = self.use_feature_idx[-1]
        gather = np.empty((k, len(virt)), dtype=np.int32)
        slots = np.empty((k,), dtype=np.int32)
        written: dict = {}
        for j in range(k):
            for a, v in enumerate(virt):
                p = phys[v]
                gather[j, a] = (
                    self.cache_len + written[p] if p in written else p
                )
            slot = phys[1]
            slots[j] = slot
            written[slot] = j
            phys = [phys[0]] + phys[2:] + [slot]
        return gather, slots, phys

    @functools.cached_property
    def _aligned_steady_fn(self):
        """Steady-state aligned step with the (s, t) fit ON DEVICE.

        The host path (``VDA_DEVICE_ALIGN=0``) blocks on every frame's D2H
        because the fit needs previously *emitted* aligned depths
        (``depth_list[abs_pred_idx]``).  Here those live in ``dring`` — a
        device ring of emitted aligned depths written at the SAME physical
        slot as each frame's cache features, so ``dring[phys[v]]`` is
        exactly ``depth_list[abs id of virtual slot v]`` (slot 0 = the
        pinned global first frame, never evicted).  Same math as the host
        fit (``compute_scale_and_shift`` over the concatenated keyframe
        maps — concatenation and summation commute), with the one-frame
        D2H lag restored: this is the only inference path that previously
        kept a mandatory per-frame host roundtrip."""
        module = self.model.module

        @functools.partial(
            jax.jit,
            static_argnames=("skip_tmp_block", "out_hw"),
            donate_argnums=(2, 3),
        )
        def step(
            params, x, cache, dring, use_idx, slot, pred_idx, align_gather,
            skip_tmp_block=False, out_hw=None,
        ):
            from video_depth_anything_tpu.ops.scale_shift import (
                compute_scale_and_shift_jax,
            )

            gathered = tuple(c[use_idx] for c in cache)
            depth, new_feats = module.apply(
                {"params": params},
                x,
                gathered,
                pred_idx=pred_idx,
                skip_tmp_block=skip_tmp_block,
                method="streaming_step",
            )
            if out_hw is not None and out_hw != depth.shape[1:]:
                from video_depth_anything_tpu.ops.resize import bilinear_resize

                depth = bilinear_resize(
                    depth[..., None].astype(jnp.float32), *out_hw
                )[..., 0]
            depth = depth.astype(jnp.float32)
            n_kf = pred_idx.shape[0]
            # (n_kf, fh, fw) emitted depths; upcast for the fit (the ring
            # may store fp16/bf16 — VDA_RING_DTYPE)
            old_kf = dring[align_gather].astype(jnp.float32)
            s, t = compute_scale_and_shift_jax(depth[:n_kf], old_kf)
            aligned = depth[-1] * s + t
            cache = tuple(
                c.at[slot].set(f[0]) for c, f in zip(cache, new_feats)
            )
            dring = dring.at[slot].set(aligned.astype(dring.dtype))
            return transfer_cast(aligned[None]), cache, dring

        return step

    @functools.cached_property
    def _dring_write_fn(self):
        # donated multi-slot write used by the host-fit transition phase to
        # seed the device depth ring
        @functools.partial(jax.jit, donate_argnums=(0,))
        def write(dring, slots, vals):
            return dring.at[slots].set(vals.astype(dring.dtype))

        return write

    @functools.cached_property
    def _cache_write_fn(self):
        # donated single-slot write: the cache buffers update in place on
        # device instead of being copied whole every frame
        @functools.partial(jax.jit, donate_argnums=(0,))
        def write(cache, feats, slot):
            return tuple(c.at[slot].set(f[0]) for c, f in zip(cache, feats))

        return write

    # -- main loop ----------------------------------------------------------

    def infer(
        self,
        frames: np.ndarray,
        target_fps: float = -1,
        skip_tmp_block: bool = False,
        progress: bool = False,
        warmup: bool = True,
    ) -> Tuple[np.ndarray, float]:
        if not warmup:
            raise NotImplementedError("warmup=False is not implemented")
        org_len, fh, fw = frames.shape[:3]
        L, max_kf = self.L, self.max_kf
        dtype = self.model.dtype
        params = self._params

        pre = preprocess_frames(frames, self.input_size)
        # host_upsample (plain mode only): emit model-res fp32 depth from
        # the device; the source-res upsample runs in the emit drain
        out_hw_dev = None if self.host_upsample else (fh, fw)

        cache: Optional[List[jnp.ndarray]] = None
        depth_list: List[np.ndarray] = []
        pending: List[jnp.ndarray] = []

        def emit(depth_out, force=False):
            """One-dispatch lag: start this result's D2H now so it
            overlaps the next dispatch; drain older finished transfers
            (all of them when ``force``)."""
            if depth_out is not None:
                pending.append(start_host_transfer(depth_out))
            while pending and (force or len(pending) > 1):
                d = np.asarray(pending.pop(0), dtype=np.float32)
                if self.host_upsample:
                    from video_depth_anything_tpu.ops.resize import (
                        bilinear_resize_np,
                    )

                    d = bilinear_resize_np(d, fh, fw)
                depth_list.extend(d[j] for j in range(d.shape[0]))

        old_keyframes_started = False
        # device ring of emitted aligned depths (see _aligned_steady_fn);
        # VDA_DEVICE_ALIGN=0 falls back to the host fit everywhere
        import os

        device_align = (
            self.align and os.environ.get("VDA_DEVICE_ALIGN", "1") != "0"
        )
        dring: Optional[jnp.ndarray] = None
        if device_align:
            dring = jnp.zeros((self.cache_len, fh, fw), self.ring_dtype)
        # Virtual→physical slot map: the reference shifts the whole cache
        # every steady step (video_depth.py:288-296, a full-buffer rewrite of
        # all 4 levels); here the shift is a host-side index permutation and
        # the device only writes the one new frame into the freed slot.
        phys = list(range(self.cache_len))

        bar = None
        if progress:
            from tqdm import tqdm

            bar = tqdm(total=org_len, desc="frames")

        steady_from = L + max_kf
        i = 0
        while i < org_len:
            # -- chunked steady state (aligned): scan K fit-chained steps --
            if (
                self.align
                and device_align
                and self.chunk > 1
                and i >= steady_from
                and org_len - i >= self.chunk
            ):
                k = self.chunk
                xs = self._dev(jnp.asarray(pre[i : i + k], dtype=dtype))
                use_rows, slots, gathers, phys = self._aligned_steady_indices(
                    phys, k
                )
                depth, cache, dring = self._aligned_chunk_fn(
                    params,
                    xs,
                    cache,
                    dring,
                    jnp.asarray(use_rows),
                    jnp.asarray(slots),
                    jnp.asarray(gathers),
                    jnp.asarray(self.align_idx[-1], dtype=jnp.int32),
                    skip_tmp_block=skip_tmp_block,
                    out_hw=(fh, fw),
                )
                emit(depth)
                i += k
                if bar is not None:
                    bar.update(k)
                continue

            # -- chunked steady state: no host feedback, batch K frames -----
            if (
                not self.align
                and self.chunk > 1
                and i >= steady_from
                and org_len - i >= self.chunk
            ):
                k = self.chunk
                xs = self._dev(jnp.asarray(pre[i : i + k], dtype=dtype))
                gather, slots, phys = self._steady_indices(phys, k)
                depth, cache = self._chunk_fn(
                    params,
                    xs,
                    cache,
                    jnp.asarray(gather),
                    jnp.asarray(slots),
                    skip_tmp_block=skip_tmp_block,
                    out_hw=out_hw_dev,
                )
                emit(depth)
                i += k
                if bar is not None:
                    bar.update(k)
                continue

            x = self._dev(jnp.asarray(pre[i][None], dtype=dtype))
            if i < L - 1:
                feats = self._encode_fn(params, x)
                if cache is None:
                    cache = tuple(
                        jnp.zeros((self.cache_len,) + f.shape[1:], dtype=f.dtype)
                        for f in feats
                    )
                cache = self._cache_write_fn(cache, feats, jnp.int32(i))
                i += 1
                if bar is not None:
                    bar.update(1)
                continue

            # select gather schedule + depth prediction slots
            if i < L + max_kf:
                sched = i - (L - 1)
            else:
                sched = -1
            use_idx = np.asarray(self.use_feature_idx[sched], dtype=np.int64)

            pred_idx: Optional[Tuple[int, ...]] = None
            abs_pred_idx: Optional[List[int]] = None
            if self.align:
                if i < L + max_kf:
                    abs_pred_idx = [
                        int(use_idx[j]) for j in self.align_idx[sched]
                    ]
                    if i == L - 1:
                        pred_idx = tuple(int(v) for v in use_idx)
                    else:
                        pred_idx = tuple(self.align_idx[sched])
                else:
                    pred_idx = tuple(self.align_idx[-1])
                    abs_pred_idx = []
                    for j in self.align_idx[-1]:
                        v = int(use_idx[j])
                        if v == 0:
                            abs_pred_idx.append(0)
                        else:
                            # cache has shifted since the transition phase
                            # (ref video_depth.py:263-269)
                            abs_pred_idx.append(v + (i - (L + max_kf)) + 1)

            use_idx = np.asarray([phys[v] for v in use_idx], dtype=np.int64)
            pred_idx_arr = (
                None
                if pred_idx is None
                else jnp.asarray(pred_idx, dtype=jnp.int32)
            )
            # slot selection (semantics of ref video_depth.py:278-296, but
            # the shift is the virtual-slot permutation — drop virtual slot 1,
            # keep the anchor, write the new frame into the freed slot)
            if i < self.cache_len:
                slot = i
            else:
                slot = phys[1]
                phys = [phys[0]] + phys[2:] + [slot]

            if device_align and i >= steady_from:
                # steady aligned step, fit on device (one-frame D2H lag)
                align_gather = use_idx[list(self.align_idx[-1])]
                depth, cache, dring = self._aligned_steady_fn(
                    params,
                    x,
                    cache,
                    dring,
                    jnp.asarray(use_idx),
                    jnp.int32(slot),
                    pred_idx_arr,
                    jnp.asarray(align_gather),
                    skip_tmp_block=skip_tmp_block,
                    out_hw=(fh, fw),
                )
                emit(depth)
                i += 1
                if bar is not None:
                    bar.update(1)
                continue

            depth, cache = self._step_fn(
                params,
                x,
                cache,
                jnp.asarray(use_idx),
                jnp.int32(slot),
                pred_idx=pred_idx_arr,
                skip_tmp_block=skip_tmp_block,
                out_hw=out_hw_dev,
                cast=not self.align,
            )

            # depth bookkeeping / alignment (ref video_depth.py:301-319)
            if self.align:
                # transition phase (bounded, ≈ L+max_kf frames): the host
                # alignment chain needs this frame's depth now; emitted
                # depths also seed the device ring for the steady phase
                depth = np.asarray(depth, dtype=np.float32)
                if not old_keyframes_started:
                    old_keyframes_started = True
                    depth_list.extend(depth[k] for k in range(depth.shape[0]))
                    if device_align:
                        slots = np.concatenate([use_idx, [slot]]).astype(np.int32)
                        dring = self._dring_write_fn(
                            dring, jnp.asarray(slots), jnp.asarray(depth)
                        )
                else:
                    cur_pred = depth[-1]
                    n_kf = len(pred_idx)
                    cur_kf = np.concatenate([depth[k] for k in range(n_kf)])
                    old_kf = np.concatenate(
                        [depth_list[j] for j in abs_pred_idx]
                    )
                    s, t = compute_scale_and_shift(cur_kf, old_kf)
                    emitted = cur_pred * s + t
                    depth_list.append(emitted)
                    if device_align:
                        dring = self._dring_write_fn(
                            dring,
                            jnp.asarray([slot], dtype=jnp.int32),
                            jnp.asarray(emitted[None]),
                        )
            else:
                # keep the result on device for one frame so its D2H copy
                # overlaps the next step's compute
                emit(depth)
            i += 1
            if bar is not None:
                bar.update(1)

        if bar is not None:
            bar.close()
        emit(None, force=True)

        if self.align:
            depth_list = depth_list[1:org_len]
        else:
            depth_list = depth_list[:org_len]
        if not depth_list:
            # fewer frames than the inference window -> nothing predicted
            # (reference guards this at the eval layer, eval.py:126)
            return np.zeros((0, fh, fw), np.float32), target_fps
        return np.stack(depth_list, axis=0), target_fps
