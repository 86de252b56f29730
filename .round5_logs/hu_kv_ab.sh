#!/bin/bash
cd /root/repo
V=/root/reference/assets/example_videos/Tokyo-Walk_rgb.mp4
for cfg in "kv" "kv_hu" "kv_fp16" "kv_hu_fp16"; do
  case $cfg in
    kv) args="";;
    kv_hu) args="--host_upsample";;
    kv_fp16) args="--transfer_dtype fp16";;
    kv_hu_fp16) args="--host_upsample --transfer_dtype fp16";;
  esac
  for run in 1 2; do
    echo "=== $cfg run$run"
    timeout 900 python run.py --input_video "$V" --output_dir /tmp/r5_hu_ab \
      --encoder vits --random_init --process_single_image --kv_cache \
      --stream_chunk 8 $args 2>&1 | grep "end-to-end"
  done
done
