#!/bin/bash
# HerdNet-data training launcher (reference analog: train_herdnet.sh).
# Expects CSVs already converted with data/csv_to_coco.py:
#   python -m wildlifemapper_tpu.data.csv_to_coco --csv train.csv \
#       --image_dir images/train --out coco_annotations/train.json
set -e
ANN=${ANN:-./coco_annotations}
IMAGES=${IMAGES:-./images}
python -m wildlifemapper_tpu.cli.train \
    --coco_path "$ANN" --image_root "$IMAGES" \
    --use_amp --content_size 768 --crop_prologue --window_size 12 \
    --batch_size 8 --num_workers "$(nproc)" --worker_mode process \
    --device_normalize \
    --work_dir ./checkpoints "$@"
