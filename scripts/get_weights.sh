#!/bin/bash
# Fetch the released Video-Depth-Anything checkpoints (reference
# get_weights.sh:1-6).  The .pth files are converted on the fly by
# io/checkpoint.load_torch_checkpoint when passed to run.py/eval.py;
# convert once to the native Orbax format with:
#   python -c "from video_depth_anything_tpu.io import checkpoint as c; \
#     from video_depth_anything_tpu.config import get_model_config; \
#     c.save_native('checkpoints/vits_native', \
#       c.load_torch_checkpoint('checkpoints/video_depth_anything_vits.pth', get_model_config('vits')))"
set -e
mkdir -p checkpoints
cd checkpoints
wget -nc https://huggingface.co/depth-anything/Video-Depth-Anything-Small/resolve/main/video_depth_anything_vits.pth
wget -nc https://huggingface.co/depth-anything/Video-Depth-Anything-Large/resolve/main/video_depth_anything_vitl.pth
