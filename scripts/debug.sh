#!/bin/bash
# Short smoke run (reference: debug.sh / run_with_wandb.sh "debug": 5 epochs)
python -m wildlifemapper_tpu.cli.train \
    --coco_path "${COCO_PATH:-/root/reference/coco_annotations}" \
    --synthetic_data --epochs 5 --batch_size 2 "$@"
