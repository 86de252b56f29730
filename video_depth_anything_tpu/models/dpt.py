"""DPT fusion head with temporal motion modules, NHWC.

Functional equivalent of the reference head (``video_depth_anything/dpt.py:
47-159``, ``dpt_temporal.py:22-260``, ``util/blocks.py:37-162``) with
TPU-native choices:

* 1×1 "project" convs are Dense layers over the channel axis (same GEMM the
  MXU would run, minus layout shuffles).
* The k=4/s=4 and k=2/s=2 transposed convs of the resize stack are
  GEMM+pixel-shuffle (``layers.Deconv2dPixelShuffle``), exact for k==s.
* All bilinear upsamples are ``align_corners=True`` weight-matrix GEMMs
  (``ops.resize``), bit-matching torch's interpolation arithmetic in fp32.
* ``output_conv2`` always runs in fp32, mirroring the reference's disabled
  autocast island (``dpt_temporal.py:95-97``).

Temporal modules sit at the same four points as the reference
(``dpt_temporal.py:75-87``): on layer_3 and layer_4 before the scratch
convs, and after refinenet4 / refinenet3.

Three entry points (all sharing the same parameters):

* ``__call__`` — batch window forward (ref ``dpt_temporal.py:53-99``)
* ``level_features`` — per-frame pre-motion features for the streaming
  cache (ref ``get_motion_features``, ``dpt_temporal.py:101-131``)
* ``streaming_forward`` — cached features + new frame, depth for selected
  indices only (ref ``foward_single_image`` [sic], ``dpt_temporal.py:133-260``)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from video_depth_anything_tpu.config import ModelConfig
from video_depth_anything_tpu.models.layers import (
    Conv2d,
    Deconv2dPixelShuffle,
    DTypeDense,
    _depth_to_space,
    _s2d_profitable,
    _space_to_depth,
)
from video_depth_anything_tpu.models.temporal import TemporalModule
from video_depth_anything_tpu.ops.resize import bilinear_resize, bilinear_resize_packed


class ResidualConvUnit(nn.Module):
    """ReLU→conv3×3→ReLU→conv3×3 + residual (ref ``util/blocks.py:37-91``)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(x)
        h = Conv2d(self.features, 3, padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = Conv2d(self.features, 3, padding=1, name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion (ref ``util/blocks.py:94-162``): optional skip
    through an RCU, main RCU, bilinear resize, 1×1 out conv."""

    features: int

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: Optional[jnp.ndarray] = None,
        out_hw: Optional[Tuple[int, int]] = None,
    ) -> jnp.ndarray:
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[-3] * 2, x.shape[-2] * 2)
        # Measured-and-rejected (v5e, docs/PERFORMANCE.md): commuting the
        # 1×1 out_conv BEFORE the upsample (exact — bilinear align_corners
        # rows sum to 1) to run its GEMM at the low resolution, paired with
        # a fused [resize→conv] Pallas kernel (ops/pallas_resize_conv.py).
        # Both LOSE: XLA already folds the post-resize 1×1 into the resize
        # GEMM chain (vits window 97.2 → 101.6 ms with the commute; the
        # fused kernel 21.6 vs 18.4 ms XLA standalone).  Reference order
        # stays (util/blocks.py:156-161).
        x = bilinear_resize(x, out_hw[0], out_hw[1])
        return Conv2d(self.features, 1, name="out_conv")(x)


class DPTHeadTemporal(nn.Module):
    """Temporal DPT head over tapped encoder features."""

    cfg: ModelConfig
    attn_impl: str = "auto"

    def setup(self):
        cfg = self.cfg
        out_ch = cfg.out_channels
        f = cfg.features
        # DTypeDense, not nn.Dense: the default flax promotion rule would
        # compute bf16 @ fp32 in fp32 and silently run the ENTIRE head
        # (convs, refinenets, motion modules) in fp32 downstream.  The
        # reference runs the head under fp16 autocast with only output_conv2
        # forced fp32 (dpt_temporal.py:95-97), mirrored by _output_head.
        self.project_0 = DTypeDense(out_ch[0])
        self.project_1 = DTypeDense(out_ch[1])
        self.project_2 = DTypeDense(out_ch[2])
        self.project_3 = DTypeDense(out_ch[3])
        self.resize_0 = Deconv2dPixelShuffle(out_ch[0], 4)
        self.resize_1 = Deconv2dPixelShuffle(out_ch[1], 2)
        self.resize_3 = Conv2d(out_ch[3], 3, stride=2, padding=1)
        self.layer1_rn = Conv2d(f, 3, padding=1, use_bias=False)
        self.layer2_rn = Conv2d(f, 3, padding=1, use_bias=False)
        self.layer3_rn = Conv2d(f, 3, padding=1, use_bias=False)
        self.layer4_rn = Conv2d(f, 3, padding=1, use_bias=False)
        self.refinenet1 = FeatureFusionBlock(f)
        self.refinenet2 = FeatureFusionBlock(f)
        self.refinenet3 = FeatureFusionBlock(f)
        self.refinenet4 = FeatureFusionBlock(f)
        self.output_conv1 = Conv2d(f // 2, 3, padding=1)
        self.output_conv2_0 = Conv2d(32, 3, padding=1)
        self.output_conv2_2 = Conv2d(1, 1)
        # nn.remat is parameter-transparent (same names/shapes); it only
        # changes what the backward saves — see ModelConfig.remat_motion.
        mod_cls = nn.remat(TemporalModule) if cfg.remat_motion else TemporalModule
        self.motion_0 = mod_cls(cfg.motion, out_ch[2], self.attn_impl)
        self.motion_1 = mod_cls(cfg.motion, out_ch[3], self.attn_impl)
        self.motion_2 = mod_cls(cfg.motion, cfg.features, self.attn_impl)
        self.motion_3 = mod_cls(cfg.motion, cfg.features, self.attn_impl)

    # -- shared pieces ------------------------------------------------------

    def _temporal(self, module, x: jnp.ndarray, batch: int) -> jnp.ndarray:
        """(B*T, H, W, C) → motion module over the frame axis → same shape."""
        y = x.reshape((batch, x.shape[0] // batch) + x.shape[1:])
        y = module(y)
        return y.reshape(x.shape)

    def _temporal_collect(self, module, x: jnp.ndarray, batch: int):
        """Like ``_temporal`` but also returns the module's position-free
        K/V caches for the KV streaming mode (warmup capture)."""
        y = x.reshape((batch, x.shape[0] // batch) + x.shape[1:])
        y, caches = module.collect(y)
        return y.reshape(x.shape), caches

    def _temporal_kv(self, module, x_new: jnp.ndarray, caches, pin_anchor=False):
        """(Q, H, W, C) query-frame maps → module.kv_step → same shape."""
        y = x_new.reshape((1,) + x_new.shape)
        y, new_caches = module.kv_step(y, caches, pin_anchor=pin_anchor)
        return y.reshape(x_new.shape), new_caches

    def level_features(
        self, features: Sequence[jnp.ndarray], ph: int, pw: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Per-frame projection + resize stack (pre-motion), N frames each
        ``(N, ph*pw, D)`` → 4 maps at 4×/2×/1×/0.5× patch resolution
        (ref ``dpt.py:60-90``, ``dpt_temporal.py:101-131``)."""
        n = features[0].shape[0]

        def to_map(x):
            return x.reshape(n, ph, pw, x.shape[-1])

        l1 = self.resize_0(self.project_0(to_map(features[0])))
        l2 = self.resize_1(self.project_1(to_map(features[1])))
        l3 = self.project_2(to_map(features[2]))
        l4 = self.resize_3(self.project_3(to_map(features[3])))
        return l1, l2, l3, l4

    def _packed_plan(self) -> Optional[str]:
        """Where to switch the output stack into the 2×2 space-to-depth
        layout (exact, checkpoint-transparent — see layers._s2d_kernel).
        The small-channel convs of the stack pay up to 16× MXU lane padding
        unpacked (docs/PERFORMANCE.md); packing cuts that to 4× but only
        pays where ``_s2d_profitable``:

        * "pre" — before output_conv1 (vits: 64→32 conv gains too),
        * "post" — after output_conv1 (vitb: 128→64 would lose, 64→32 gains),
        * None — stay unpacked (vitl: already lane-full).

        The resize runs packed either way (``bilinear_resize_packed``: same
        taps/FLOPs, no relayout), so the only added relayouts are one pack at
        296²-scale and the 4→1-channel unpack of the final depth map."""
        if not self.cfg.packed_output_stack:
            return None
        f = self.cfg.features
        if _s2d_profitable(f, f // 2):
            return "pre"
        if _s2d_profitable(f // 2, 32):
            return "post"
        return None

    def _head_kernels_ok(self, x: jnp.ndarray) -> bool:
        """Common gate for the fused head kernels (mid + tail): bf16 path,
        no fp32 island, on TPU, not initializing (the XLA fallback paths
        create the conv parameters), and no packed small-channel plan —
        vits/vitb keep the 2×2 space-to-depth XLA output stack, which
        measures equal to the frame-packed fused kernel end-to-end at ~15×
        cheaper compile (docs/PERFORMANCE.md)."""
        if not self.cfg.fused_output_tail or self.cfg.fp32_head_island:
            return False
        if self.is_initializing() or x.dtype != jnp.bfloat16:
            return False
        if self._packed_plan() is not None:
            return False
        from video_depth_anything_tpu.ops.flash_attention import _on_tpu

        return _on_tpu()

    def _try_fused_tail(
        self, out: jnp.ndarray, ph: int, pw: int
    ) -> Optional[jnp.ndarray]:
        """Run [resize → output_conv2] on the post-``output_conv1`` map as
        the fused Pallas tail kernel (ops/pallas_output_stack.py) when it
        covers the shape: one pass in VMEM instead of HBM-materialized
        resize GEMMs + convs.  Returns ``None`` → XLA paths."""
        if not self._head_kernels_ok(out):
            return None
        p = self.variables["params"]
        try:
            c20, c22 = p["output_conv2_0"], p["output_conv2_2"]
        except KeyError:  # pragma: no cover - restored partial trees
            return None
        from video_depth_anything_tpu.ops.pallas_output_stack import (
            try_fused_output_tail,
        )

        return try_fused_output_tail(
            out, c20["kernel"], c20["bias"], c22["kernel"], c22["bias"],
            ph * 14, pw * 14,
        )

    def _output_head(self, path1: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
        out = self._conv1_and_packed(path1, ph, pw)
        if out.shape[-1] == 1:  # packed path returned finished depth
            return out
        fused = self._try_fused_tail(out, ph, pw)
        if fused is not None:
            return fused
        out = bilinear_resize(out, ph * 14, pw * 14)
        if self.cfg.fp32_head_island:
            # fp32 island (ref dpt_temporal.py:95-97) — see
            # ModelConfig.fp32_head_island for why bf16 skips it on TPU.
            out = out.astype(jnp.float32)
        out = self.output_conv2_0(out)
        out = nn.relu(out)
        out = self.output_conv2_2(out)
        return nn.relu(out)

    def _conv1_and_packed(
        self, path1: jnp.ndarray, ph: int, pw: int
    ) -> jnp.ndarray:
        plan = self._packed_plan()
        if plan is not None and path1.shape[-3] % 2 == 0 and path1.shape[-2] % 2 == 0:
            if plan == "pre":
                out = self.output_conv1(_space_to_depth(path1), packed=True)
            else:
                out = _space_to_depth(self.output_conv1(path1))
            out = bilinear_resize_packed(out, ph * 14, pw * 14)
            if self.cfg.fp32_head_island:
                out = out.astype(jnp.float32)
            out = self.output_conv2_0(out, packed=True)
            out = nn.relu(out)
            out = self.output_conv2_2(out, packed=True)
            out = nn.relu(out)
            # unpack the (N, 7ph, 7pw, 4) depth map to (N, 14ph, 14pw, 1)
            return _depth_to_space(out)
        return self.output_conv1(path1)

    # -- batch window forward ----------------------------------------------

    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        batch: int,
        frames: int,
        ph: int,
        pw: int,
        skip_tmp_block: bool = False,
    ) -> jnp.ndarray:
        l1, l2, l3, l4 = self.level_features(features, ph, pw)

        l3 = self._temporal(self.motion_0, l3, batch)
        l4 = self._temporal(self.motion_1, l4, batch)

        r1 = self.layer1_rn(l1)
        r2 = self.layer2_rn(l2)
        r3 = self.layer3_rn(l3)
        r4 = self.layer4_rn(l4)

        path4 = self.refinenet4(r4, out_hw=r3.shape[-3:-1])
        if not skip_tmp_block:
            path4 = self._temporal(self.motion_2, path4, batch)
        path3 = self.refinenet3(path4, r3, out_hw=r2.shape[-3:-1])
        path3 = self._temporal(self.motion_3, path3, batch)
        path2 = self.refinenet2(path3, r2, out_hw=r1.shape[-3:-1])
        path1 = self.refinenet1(path2, r1)
        return self._output_head(path1, ph, pw)

    # -- KV-cache streaming (the working DPTHeadTemporalCrossAtt equivalent,
    # ref dpt_temporal.py:263-343 + motion_module.py:275-288, bug-fixed) ----

    def window_forward_collect_kv(
        self,
        features: Sequence[jnp.ndarray],
        batch: int,
        frames: int,
        ph: int,
        pw: int,
        skip_tmp_block: bool = False,
    ):
        """Batch window forward that ALSO captures every motion module's
        position-free K/V — the warmup pass of the KV streaming mode.
        Returns ``(depth, (kv0, kv1, kv2, kv3))``; ``kv2`` is ``()`` when
        ``skip_tmp_block`` (motion module 2 never runs in that config)."""
        l1, l2, l3, l4 = self.level_features(features, ph, pw)

        l3, kv0 = self._temporal_collect(self.motion_0, l3, batch)
        l4, kv1 = self._temporal_collect(self.motion_1, l4, batch)

        r1 = self.layer1_rn(l1)
        r2 = self.layer2_rn(l2)
        r3 = self.layer3_rn(l3)
        r4 = self.layer4_rn(l4)

        path4 = self.refinenet4(r4, out_hw=r3.shape[-3:-1])
        kv2 = ()
        if not skip_tmp_block:
            path4, kv2 = self._temporal_collect(self.motion_2, path4, batch)
        path3 = self.refinenet3(path4, r3, out_hw=r2.shape[-3:-1])
        path3, kv3 = self._temporal_collect(self.motion_3, path3, batch)
        path2 = self.refinenet2(path3, r2, out_hw=r1.shape[-3:-1])
        path1 = self.refinenet1(path2, r1)
        return self._output_head(path1, ph, pw), (kv0, kv1, kv2, kv3)

    def streaming_kv_forward(
        self,
        new_features: Sequence[jnp.ndarray],
        kv_caches,
        ph: int,
        pw: int,
        skip_tmp_block: bool = False,
        anchor_levels=None,
    ):
        """One KV-streaming step: encoder taps of the newest frame only →
        depth of that frame, O(1 frame) work everywhere (each motion module
        attends its single query frame over its K/V ring cache — no
        re-running the 32-frame window, unlike ``streaming_forward``).
        Returns ``(depth (Q, 14ph, 14pw, 1), new kv_caches)``.

        ``anchor_levels`` (4 per-level maps of the global first frame, each
        ``(1, h_l, w_l, C_l)``): the realignment mode — the anchor is
        re-predicted alongside the newest frame (queries [anchor, new] at
        APE slots [0, last]; O(1) extra head work, no extra encoder work),
        its cache slot 0 stays pinned, and the caller scale/shift-fits the
        anchor's fresh prediction against its stored depth — the KV-mode
        equivalent of the reference's per-frame keyframe realignment
        (``video_depth.py:303-317``, anchor ``tmp[0] = 0`` pinned
        forever)."""
        levels = self.level_features(new_features, ph, pw)
        return self.streaming_kv_head_step(
            levels, kv_caches, ph, pw,
            skip_tmp_block=skip_tmp_block, anchor_levels=anchor_levels,
        )

    def streaming_kv_head_step(
        self,
        levels,
        kv_caches,
        ph: int,
        pw: int,
        skip_tmp_block: bool = False,
        anchor_levels=None,
    ):
        """The post-encoder half of ``streaming_kv_forward``: per-frame
        pre-motion level features (each ``(1, h_l, w_l, C_l)``) + KV caches →
        (depth, new caches).  Split out so the chunked KV mode can batch the
        encoder over K frames and ``lax.scan`` only this cache-sequential
        part (``inference/kv_streaming.py``)."""
        n1, n2, n3, n4 = levels
        kv0, kv1, kv2, kv3 = kv_caches
        pin = anchor_levels is not None
        if pin:
            a1, a2, a3, a4 = anchor_levels
            n1 = jnp.concatenate([a1, n1], axis=0)
            n2 = jnp.concatenate([a2, n2], axis=0)
            n3 = jnp.concatenate([a3, n3], axis=0)
            n4 = jnp.concatenate([a4, n4], axis=0)

        l3, kv0 = self._temporal_kv(self.motion_0, n3, kv0, pin)
        l4, kv1 = self._temporal_kv(self.motion_1, n4, kv1, pin)

        r1 = self.layer1_rn(n1)
        r2 = self.layer2_rn(n2)
        r3 = self.layer3_rn(l3)
        r4 = self.layer4_rn(l4)

        path4 = self.refinenet4(r4, out_hw=r3.shape[-3:-1])
        if not skip_tmp_block:
            path4, kv2 = self._temporal_kv(self.motion_2, path4, kv2, pin)
        path3 = self.refinenet3(path4, r3, out_hw=r2.shape[-3:-1])
        path3, kv3 = self._temporal_kv(self.motion_3, path3, kv3, pin)
        path2 = self.refinenet2(path3, r2, out_hw=r1.shape[-3:-1])
        path1 = self.refinenet1(path2, r1)
        depth = self._output_head(path1, ph, pw)
        return depth, (kv0, kv1, kv2, kv3)

    # -- chunked steady-state streaming --------------------------------------

    def streaming_chunk_forward(
        self,
        n1: jnp.ndarray,
        n2: jnp.ndarray,
        w3: jnp.ndarray,
        w4: jnp.ndarray,
        ph: int,
        pw: int,
        skip_tmp_block: bool = False,
    ) -> jnp.ndarray:
        """K independent steady-state streaming steps as ONE batched program.

        The level-feature cache holds *pre-motion* per-frame features — pure
        functions of each frame's encoder taps — so K consecutive steady
        steps (``pred_idx=None``: depth of the newest frame only) have no
        sequential dependency and batch over a leading chunk axis.  Exactly
        the math of K ``streaming_forward`` calls, at batch efficiency and
        1/K the dispatch overhead.

        ``n1, n2``: the newest frame per chunk position, ``(K, h, w, C)``
        (levels 1/2 only feed the predicted frame's refinenet path).
        ``w3, w4``: each position's full gathered window ``(K, T, h, w, C)``
        (cache gather + its own frame appended, done by the caller).
        Returns depth ``(K, 14ph, 14pw, 1)``.
        """
        k, t = w3.shape[0], w3.shape[1]

        def flat(x):
            return x.reshape((k * t,) + x.shape[2:])

        def unflat(x):
            return x.reshape((k, t) + x.shape[1:])

        r1 = self.layer1_rn(n1)
        r2 = self.layer2_rn(n2)
        l4 = self.motion_1(w4)
        r4 = self.layer4_rn(flat(l4))
        l3 = self.motion_0(w3)
        r3 = self.layer3_rn(flat(l3))

        path4 = self.refinenet4(r4, out_hw=r3.shape[-3:-1])
        if not skip_tmp_block:
            path4 = flat(self.motion_2(unflat(path4)))
        path3 = self.refinenet3(path4, r3, out_hw=r2.shape[-3:-1])
        path3 = self.motion_3(unflat(path3))
        path3 = path3[:, -1]  # newest frame per chunk position
        path2 = self.refinenet2(path3, r2, out_hw=r1.shape[-3:-1])
        path1 = self.refinenet1(path2, r1)
        return self._output_head(path1, ph, pw)

    # -- streaming forward --------------------------------------------------

    def streaming_forward(
        self,
        new_features: Sequence[jnp.ndarray],
        cached: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
        ph: int,
        pw: int,
        pred_idx: Optional[jnp.ndarray] = None,
        skip_tmp_block: bool = False,
    ):
        """One streaming step (ref ``dpt_temporal.py:133-260``).

        ``new_features``: encoder taps of the current frame, each (1, N, D).
        ``cached``: the 4 gathered pre-motion level-feature windows, each
        ``(T-1, h_l, w_l, C_l)``.  ``pred_idx``: window positions (static)
        whose depth is predicted in addition to the current frame; ``None``
        predicts only the current frame.

        Returns ``(depth (P, 14ph, 14pw, 1) fp32, new level features ×4)``.
        """
        levels = self.level_features(new_features, ph, pw)
        return self.streaming_head_step(
            levels, cached, ph, pw, pred_idx=pred_idx,
            skip_tmp_block=skip_tmp_block,
        )

    def streaming_head_step(
        self,
        levels,
        cached: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
        ph: int,
        pw: int,
        pred_idx: Optional[jnp.ndarray] = None,
        skip_tmp_block: bool = False,
    ):
        """The post-encoder half of ``streaming_forward``: the new frame's
        pre-motion level features (each ``(1, h_l, w_l, C_l)``) + gathered
        cache windows → (depth, new level features).  Split out so the
        chunked aligned mode can batch the encoder over K frames and
        ``lax.scan`` only this cache-sequential part."""
        n1, n2, n3, n4 = levels
        c1, c2, c3, c4 = cached
        t = c3.shape[0] + 1

        if pred_idx is not None:
            # traced index vector (static length) — gathers stay dynamic so
            # the transition-phase schedules reuse one compiled program
            idx = jnp.asarray(pred_idx, dtype=jnp.int32)
            l1p = jnp.concatenate([c1[idx], n1], axis=0)
            l2p = jnp.concatenate([c2[idx], n2], axis=0)
        else:
            l1p, l2p = n1, n2
        l3 = jnp.concatenate([c3, n3], axis=0)
        l4 = jnp.concatenate([c4, n4], axis=0)

        r1 = self.layer1_rn(l1p)
        r2 = self.layer2_rn(l2p)
        l4 = self._temporal(self.motion_1, l4, 1)
        r4 = self.layer4_rn(l4)
        l3 = self._temporal(self.motion_0, l3, 1)
        r3 = self.layer3_rn(l3)

        path4 = self.refinenet4(r4, out_hw=r3.shape[-3:-1])
        if not skip_tmp_block:
            path4 = self._temporal(self.motion_2, path4, 1)
        path3 = self.refinenet3(path4, r3, out_hw=r2.shape[-3:-1])
        path3 = self._temporal(self.motion_3, path3, 1)

        # Keep only the frames whose depth is requested (+ current, last).
        if pred_idx is not None:
            sel = jnp.concatenate(
                [idx, jnp.asarray([t - 1], dtype=jnp.int32)]
            )
            path3 = path3[sel]
        else:
            path3 = path3[-1:]

        path2 = self.refinenet2(path3, r2, out_hw=r1.shape[-3:-1])
        path1 = self.refinenet1(path2, r1)
        depth = self._output_head(path1, ph, pw)
        return depth, (n1, n2, n3, n4)
