"""Data-parallel sliding-window inference.

Windows shard over the mesh ``data`` axis: the splice-resolved window inputs
(``inference.pipeline.window_frame_indices``) make every window an
independent model call, so a video's W windows run as one batched,
``data``-sharded forward.  Only the stitching pass (per-window scale/shift
scan over 2-frame overlaps) stays sequential on host — tiny.

The reference processes windows serially on one GPU (``video_depth.py:358``);
this is the TPU-native scale-out the survey's north star calls for.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PS

from video_depth_anything_tpu.inference.pipeline import (
    VideoDepthPipeline,
    padded_length,
    stitch_windows,
    window_frame_indices,
)
from video_depth_anything_tpu.ops.resize import bilinear_resize
from video_depth_anything_tpu.parallel.mesh import create_mesh
from video_depth_anything_tpu.utils.device import transfer_cast
from video_depth_anything_tpu.utils.transform import preprocess_frames


class DataParallelVideoDepthPipeline(VideoDepthPipeline):
    """Same contract as ``VideoDepthPipeline`` with windows sharded over the
    ``data`` axis of a ``('data', 'model')`` mesh and — when ``model > 1`` —
    the ViT/motion-FF weights sharded Megatron-style over ``model``
    (``parallel.mesh.TP_RULES``; SURVEY §2.6 names the TP axis a first-class
    component for vitl at high resolution).  Pass ``model_parallel=N`` or a
    prebuilt mesh; params are device_put once with their partition specs and
    GSPMD inserts the per-block ICI collectives inside the jit."""

    def __init__(
        self, model, input_size: int = 518, mesh=None, shape_bucket=None,
        model_parallel: int = 1, window_batch=None, host_upsample=None,
    ):
        super().__init__(model, input_size, shape_bucket,
                         window_batch=window_batch,
                         host_upsample=host_upsample)
        self.mesh = (
            mesh if mesh is not None else create_mesh(model=model_parallel)
        )

    @functools.cached_property
    def _sharded_params(self):
        from video_depth_anything_tpu.parallel.mesh import shard_params

        return shard_params(self.model.params, self.mesh)

    @functools.cached_property
    def _batched_window_fn(self):
        module = self.model.module
        mesh = self.mesh

        @functools.partial(
            jax.jit, static_argnames=("out_h", "out_w", "skip_tmp_block")
        )
        def fwd(params, xs, out_h, out_w, skip_tmp_block=False):
            # xs: (W, T, h, w, 3) sharded over 'data' on axis 0.
            xs = jax.lax.with_sharding_constraint(
                xs, NamedSharding(mesh, PS("data"))
            )
            depth = module.apply(
                {"params": params}, xs, skip_tmp_block=skip_tmp_block
            )  # (W, T, h, w)
            depth = depth[..., None].astype(jnp.float32)
            depth = bilinear_resize(depth, out_h, out_w)[..., 0]
            return transfer_cast(depth)  # (W, T, out_h, out_w)

        return fwd

    def compute_window_depths(
        self,
        pre: np.ndarray,
        idx: np.ndarray,
        fh: int,
        fw: int,
        skip_tmp_block: bool = False,
        progress: bool = False,
        wait_until=None,
        desc: str = "window batches",
    ) -> List[np.ndarray]:
        n_win = idx.shape[0]
        n_data = self.mesh.shape["data"]

        # Round the window batch up to the data-axis size (duplicate last) and
        # process one mesh-row of windows per step to bound device memory.
        n_pad = (-n_win) % n_data
        idx_padded = np.concatenate([idx, np.repeat(idx[-1:], n_pad, axis=0)])

        it = range(0, len(idx_padded), n_data)
        if progress:
            from tqdm import tqdm

            it = tqdm(it, desc=f"{desc} x{n_data}")

        import os

        from video_depth_anything_tpu.io.native_preproc import gather_windows_native

        use_native_gather = (
            os.environ.get("VDA_NATIVE_PREPROC", "1") != "0"
            and pre.dtype == np.float32
        )

        # host_upsample (see VideoDepthPipeline): emit model-res depth,
        # upsample after the transfer
        dev_h, dev_w = (pre.shape[1], pre.shape[2]) if self.host_upsample \
            else (fh, fw)

        window_depths: List[np.ndarray] = []
        for start in it:
            chunk_idx = idx_padded[start : start + n_data]
            if wait_until is not None:
                wait_until(int(chunk_idx.max()) + 1)
            xs = (
                gather_windows_native(pre, chunk_idx) if use_native_gather else None
            )
            if xs is None:
                xs = pre[chunk_idx]
            xs = jax.device_put(
                jnp.asarray(xs, dtype=self.model.dtype),
                NamedSharding(self.mesh, PS("data")),
            )
            depth = self._batched_window_fn(
                self._sharded_params, xs, dev_h, dev_w,
                skip_tmp_block=skip_tmp_block,
            )
            depth = np.asarray(depth, dtype=np.float32)
            if self.host_upsample:
                from video_depth_anything_tpu.ops.resize import (
                    bilinear_resize_np,
                )

                depth = bilinear_resize_np(depth, fh, fw)
            window_depths.extend(depth)
        return window_depths[:n_win]

    def infer_video_depth(
        self,
        frames: np.ndarray,
        target_fps: float = -1,
        skip_tmp_block: bool = False,
        progress: bool = False,
    ) -> Tuple[np.ndarray, float]:
        org_len, fh, fw = frames.shape[:3]
        pad_len = padded_length(org_len)
        idx = window_frame_indices(org_len)

        pre = preprocess_frames(frames, self.input_size, self._target_hw(fh, fw))
        if pad_len > org_len:
            pre = np.concatenate(
                [pre, np.repeat(pre[-1:], pad_len - org_len, axis=0)], axis=0
            )
        window_depths = self.compute_window_depths(
            pre, idx, fh, fw, skip_tmp_block=skip_tmp_block, progress=progress
        )
        return stitch_windows(window_depths, org_len), target_fps
