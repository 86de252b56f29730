from video_depth_anything_tpu.models.vda import VDAModel, VideoDepthAnything  # noqa: F401
