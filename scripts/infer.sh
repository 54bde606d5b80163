#!/bin/bash
# Visualization over the val split (reference: infer.sh)
python -m wildlifemapper_tpu.cli.visualize \
    --coco_path "${COCO_PATH:-/root/reference/coco_annotations}" \
    --image_root "${IMAGE_ROOT:-}" \
    --checkpoint "${CHECKPOINT:?set CHECKPOINT=path/to/best_checkpoint.pth}" "$@"
