"""TPU-native Video-Depth-Anything framework (JAX/XLA/Pallas/pjit)."""

__version__ = "0.1.0"

from video_depth_anything_tpu.config import (  # noqa: F401
    INFER_LEN,
    INTERP_LEN,
    KEYFRAMES,
    OVERLAP,
    InferenceConfig,
    ModelConfig,
    get_model_config,
)
