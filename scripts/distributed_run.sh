#!/bin/bash
# Multi-host TPU training (reference: distributed_run.sh / torchrun).
# On TPU pods jax.distributed discovers the topology from the environment;
# just run the same command on every host.
python -m wildlifemapper_tpu.cli.train \
    --coco_path "${COCO_PATH:-/root/reference/coco_annotations}" \
    --image_root "${IMAGE_ROOT:-}" \
    --batch_size 2 --use_amp "$@"
