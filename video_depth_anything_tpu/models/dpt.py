"""DPT fusion head with temporal motion modules, NHWC.

Functional equivalent of the reference head (``video_depth_anything/dpt.py:
47-159``, ``dpt_temporal.py:22-99``, ``util/blocks.py:37-162``) with
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
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from video_depth_anything_tpu.config import ModelConfig
from video_depth_anything_tpu.models.layers import Conv2d, Deconv2dPixelShuffle
from video_depth_anything_tpu.models.temporal import TemporalModule
from video_depth_anything_tpu.ops.resize import bilinear_resize


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
        skip: jnp.ndarray | None = None,
        out_hw: Tuple[int, int] | None = None,
    ) -> jnp.ndarray:
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if out_hw is None:
            out_hw = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = bilinear_resize(x, out_hw[0], out_hw[1])
        return Conv2d(self.features, 1, name="out_conv")(x)


class DPTHeadTemporal(nn.Module):
    """Temporal DPT head.

    ``__call__(features, batch, frames, ph, pw)`` takes the 4 tapped encoder
    outputs, each ``(B*T, ph*pw, D)``, and returns inverse depth
    ``(B*T, 14*ph, 14*pw, 1)`` (pre final-resize/ReLU — the model wrapper
    finishes those, ref ``video_depth.py:62-64``).
    """

    cfg: ModelConfig
    attn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        features: Sequence[jnp.ndarray],
        batch: int,
        frames: int,
        ph: int,
        pw: int,
        skip_tmp_block: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        bt = batch * frames
        out_ch = cfg.out_channels
        f = cfg.features

        # Per-level projection + resize stack (ref dpt.py:60-90).
        def tokens_to_map(x: jnp.ndarray) -> jnp.ndarray:
            return x.reshape(bt, ph, pw, x.shape[-1])

        l1 = nn.Dense(out_ch[0], name="project_0", dtype=features[0].dtype)(
            tokens_to_map(features[0])
        )
        l1 = Deconv2dPixelShuffle(out_ch[0], 4, name="resize_0")(l1)
        l2 = nn.Dense(out_ch[1], name="project_1", dtype=features[1].dtype)(
            tokens_to_map(features[1])
        )
        l2 = Deconv2dPixelShuffle(out_ch[1], 2, name="resize_1")(l2)
        l3 = nn.Dense(out_ch[2], name="project_2", dtype=features[2].dtype)(
            tokens_to_map(features[2])
        )
        l4 = nn.Dense(out_ch[3], name="project_3", dtype=features[3].dtype)(
            tokens_to_map(features[3])
        )
        l4 = Conv2d(out_ch[3], 3, stride=2, padding=1, name="resize_3")(l4)

        def temporal(name: str, channels: int, x: jnp.ndarray) -> jnp.ndarray:
            y = x.reshape((batch, frames) + x.shape[1:])
            y = TemporalModule(cfg.motion, channels, self.attn_impl, name=name)(y)
            return y.reshape((bt,) + x.shape[1:])

        # Motion modules 0/1 on layer_3 / layer_4 (ref dpt_temporal.py:75-76).
        l3 = temporal("motion_0", out_ch[2], l3)
        l4 = temporal("motion_1", out_ch[3], l4)

        r1 = Conv2d(f, 3, padding=1, use_bias=False, name="layer1_rn")(l1)
        r2 = Conv2d(f, 3, padding=1, use_bias=False, name="layer2_rn")(l2)
        r3 = Conv2d(f, 3, padding=1, use_bias=False, name="layer3_rn")(l3)
        r4 = Conv2d(f, 3, padding=1, use_bias=False, name="layer4_rn")(l4)

        path4 = FeatureFusionBlock(f, name="refinenet4")(r4, out_hw=r3.shape[-3:-1])
        if not skip_tmp_block:
            path4 = temporal("motion_2", f, path4)
        path3 = FeatureFusionBlock(f, name="refinenet3")(
            path4, r3, out_hw=r2.shape[-3:-1]
        )
        path3 = temporal("motion_3", f, path3)
        path2 = FeatureFusionBlock(f, name="refinenet2")(
            path3, r2, out_hw=r1.shape[-3:-1]
        )
        path1 = FeatureFusionBlock(f, name="refinenet1")(path2, r1)

        out = Conv2d(f // 2, 3, padding=1, name="output_conv1")(path1)
        out = bilinear_resize(out, ph * 14, pw * 14)
        # fp32 island (ref dpt_temporal.py:95-97).
        out = out.astype(jnp.float32)
        out = Conv2d(32, 3, padding=1, name="output_conv2_0")(out)
        out = nn.relu(out)
        out = Conv2d(1, 1, name="output_conv2_2")(out)
        out = nn.relu(out)
        return out
