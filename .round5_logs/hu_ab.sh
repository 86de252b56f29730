#!/bin/bash
cd /root/repo
V=/root/reference/assets/example_videos/Tokyo-Walk_rgb.mp4
for cfg in "base" "hu" "fp16" "hu_fp16"; do
  case $cfg in
    base) args="";;
    hu) args="--host_upsample";;
    fp16) args="--transfer_dtype fp16";;
    hu_fp16) args="--host_upsample --transfer_dtype fp16";;
  esac
  for run in 1 2; do
    echo "=== $cfg run$run"
    timeout 900 python run.py --input_video "$V" --output_dir /tmp/r5_hu_ab \
      --encoder vits --random_init $args 2>&1 | grep "end-to-end"
  done
done
