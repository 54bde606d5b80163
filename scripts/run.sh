#!/bin/bash
# Single-host training with resume (reference: wildlifemapper/run.sh)
python -m wildlifemapper_tpu.cli.train \
    --coco_path "${COCO_PATH:-/root/reference/coco_annotations}" \
    --image_root "${IMAGE_ROOT:-}" \
    --work_dir checkpoints --resume --use_amp "$@"
