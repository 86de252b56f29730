"""Central typed configuration.

The reference copy-pastes its model-config dict into five entry points
(``run.py:74-77``, ``eval.py:62-65``, ``app.py:27-30``,
``Test_singleImage_processing.py:123-126``) and keeps inference constants as
"do not change" module globals (``video_depth_anything/video_depth.py:29-33``).
Here they live in one place as frozen dataclasses.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence, Tuple

# ---------------------------------------------------------------------------
# Sliding-window inference contract (reference video_depth.py:29-33).
# These four constants define the window stitching algebra; the keyframe list
# is the permutation of previous-window frames spliced into the first OVERLAP
# slots of the next window (video_depth.py:363-364).
INFER_LEN = 32
OVERLAP = 10
KEYFRAMES: Tuple[int, ...] = (0, 12, 24, 25, 26, 27, 28, 29, 30, 31)
INTERP_LEN = 8


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """DINOv2 encoder hyper-parameters (reference ``dinov2.py:339-415``)."""

    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    patch_size: int = 14
    img_size: int = 518
    init_values: float = 1.0  # LayerScale init
    interpolate_offset: float = 0.1
    ffn_layer: str = "mlp"  # "mlp" | "swiglufused"
    norm_eps: float = 1e-6

    @property
    def pos_grid(self) -> int:
        return self.img_size // self.patch_size  # 37 for 518/14


@dataclasses.dataclass(frozen=True)
class MotionModuleConfig:
    """Temporal ("motion") module hyper-parameters
    (reference ``dpt_temporal.py:35-40``, ``motion_module.py:32-107``)."""

    num_heads: int = 8
    num_transformer_blocks: int = 1
    num_attention_blocks: int = 2
    temporal_max_len: int = 32
    norm_num_groups: int = 32
    pos_embedding_type: str = "ape"  # "ape" | "rope"
    group_norm_eps: float = 1e-6
    layer_norm_eps: float = 1e-5
    ff_mult: int = 4


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full VideoDepthAnything model configuration."""

    encoder: str
    vit: ViTConfig
    features: int
    out_channels: Tuple[int, int, int, int]
    intermediate_layer_idx: Tuple[int, int, int, int]
    motion: MotionModuleConfig = MotionModuleConfig()
    num_frames: int = 32
    use_clstoken: bool = False
    # The reference forces output_conv2 to fp32 to dodge *fp16* range/
    # precision collapse (dpt_temporal.py:95-97).  bf16 has fp32's exponent
    # range and the MXU accumulates in fp32 regardless, so on TPU the island
    # buys no accuracy (<0.1% depth deviation measured) while costing 4×
    # lane-waste fp32 traffic on (T, 518, 518, 32) maps — ~31 ms/window at
    # vits (docs/PERFORMANCE.md).  In fp32 model mode everything is fp32
    # anyway; set True to force the cast in mixed precision.
    fp32_head_island: bool = False
    # Run the DPT output stack (output_conv1 → 296→518 resize → output_conv2)
    # in a 2×2 space-to-depth layout where the packed convs beat XLA's
    # 128-lane channel padding (vits/vitb; vitl is already lane-full and
    # stays unpacked).  Exact and checkpoint-transparent — same parameters,
    # transformed kernels (models/layers._s2d_kernel), phase-split resize
    # GEMMs (ops/resize.bilinear_resize_packed).
    packed_output_stack: bool = True
    # Run [296→518 resize → output_conv2] as one fused Pallas kernel on TPU
    # (ops/pallas_output_stack.py): the XLA lowering materializes two
    # (T, 518, ·, C) fp32 resize intermediates in HBM and re-streams them
    # through the convs (~39 ms/window at vitl, ~27 at vits); the kernel
    # keeps the whole tail per (frame, row-block) in VMEM.  Numerics within
    # ~1 bf16 ulp of the XLA chain (tests/test_output_stack.py); ignored
    # off-TPU, in fp32 mode, and under ``fp32_head_island``.
    fused_output_tail: bool = True
    # Rematerialize the four motion modules on the backward pass
    # (``nn.remat``): their internals (fp32 GroupNorm stats, 8×-widened
    # GEGLU activations, attention probabilities) dominate training-peak
    # HBM at high resolution — vitl 32×518² OOMs a 16 GB chip by ~0.2 GB
    # without this.  Checkpoint-transparent (same parameters); inference is
    # unaffected (no backward).  Off by default: recompute costs one extra
    # forward through the modules per step.
    remat_motion: bool = False

    @property
    def head_in_channels(self) -> int:
        return self.vit.embed_dim


_VIT_CONFIGS: Mapping[str, ViTConfig] = {
    "vits": ViTConfig(embed_dim=384, depth=12, num_heads=6),
    "vitb": ViTConfig(embed_dim=768, depth=12, num_heads=12),
    "vitl": ViTConfig(embed_dim=1024, depth=24, num_heads=16),
    "vitg": ViTConfig(embed_dim=1536, depth=40, num_heads=24, ffn_layer="swiglufused"),
}

# Head widths + encoder tap layers per released checkpoint
# (reference run.py:74-77, video_depth.py:48-51).
_MODEL_CONFIGS = {
    "vits": dict(
        features=64,
        out_channels=(48, 96, 192, 384),
        intermediate_layer_idx=(2, 5, 8, 11),
    ),
    "vitb": dict(
        features=128,
        out_channels=(96, 192, 384, 768),
        intermediate_layer_idx=(2, 5, 8, 11),
    ),
    "vitl": dict(
        features=256,
        out_channels=(256, 512, 1024, 1024),
        intermediate_layer_idx=(4, 11, 17, 23),
    ),
    # vitg: encoder architecture exists in the reference (dinov2.py:381-395,
    # SwiGLU FFN) but no released video checkpoint; head widths and layer
    # taps follow the DepthAnything-V2 giant conventions.
    "vitg": dict(
        features=384,
        out_channels=(1536, 1536, 1536, 1536),
        intermediate_layer_idx=(9, 19, 29, 39),
    ),
}


def get_model_config(encoder: str, num_frames: int = 32) -> ModelConfig:
    if encoder not in _MODEL_CONFIGS:
        raise ValueError(
            f"unknown encoder {encoder!r}; expected one of {sorted(_MODEL_CONFIGS)}"
        )
    cfg = _MODEL_CONFIGS[encoder]
    return ModelConfig(
        encoder=encoder,
        vit=_VIT_CONFIGS[encoder],
        features=cfg["features"],
        out_channels=tuple(cfg["out_channels"]),
        intermediate_layer_idx=tuple(cfg["intermediate_layer_idx"]),
        num_frames=num_frames,
        # the reference sizes the APE table to the window length
        # (dpt_temporal.py:35-40, temporal_max_len=num_frames)
        motion=MotionModuleConfig(temporal_max_len=num_frames),
    )


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Long-video inference settings (CLI surface of reference ``run.py:29-58``)."""

    input_size: int = 518
    max_res: int = 1280
    fp32: bool = False  # False -> bf16 compute with fp32 islands
    skip_tmp_block: bool = False
    target_fps: int = -1
    max_len: int = -1
    # streaming mode
    streaming: bool = False
    inference_length: int = 32
    keyframe_list: Tuple[int, ...] = (0, 12)
    align_each_new_frame: bool = False
