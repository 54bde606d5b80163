#!/usr/bin/env bash
# Re-score a saved checkpoint series with the standalone evaluate CLI and
# print a compact per-epoch AP table. Exists because in-training val APs
# can be invalidated after the fact (round 5: the replicated PostProcess
# h/w-swap quirk silently zeroed every val AP on non-square images); this
# reconstructs the honest curve from the checkpoints on disk.
#
# Usage:
#   RUN=/root/repo/_runs/r5x16 COCO=/tmp/prof/ann_x16full \
#     EPOCHS="9 19 29 39 49 59" scripts/eval_checkpoint_series.sh
#
# EXTRA_ARGS defaults to the frame-fixed, device-normalized eval used by
# the verdict runs; override for other configurations.
set -u
cd "${REPO:-$(dirname "$0")/..}" || exit 1
RUN=${RUN:?set RUN=<work_dir with checkpoint_epoch_N>}
COCO=${COCO:-}
EPOCHS=${EPOCHS:-$(ls -d "$RUN"/checkpoint_epoch_* 2>/dev/null |
  sed 's/.*checkpoint_epoch_//' | sort -n | tr '\n' ' ')}
EXTRA_ARGS=${EXTRA_ARGS:---synthetic_data --device_normalize --aux_loss --fix_hw_swap}
BATCH=${BATCH:-8}
BOUND=${BOUND:-900}
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/wm_jax_cache}"

for ep in $EPOCHS; do
  ckpt="$RUN/checkpoint_epoch_$ep"
  [ -d "$ckpt" ] || { echo "=== epoch $ep: MISSING ($ckpt)"; continue; }
  echo "=== epoch $ep ==="
  # shellcheck disable=SC2086
  timeout "$BOUND" python -m wildlifemapper_tpu.cli.evaluate $EXTRA_ARGS \
    ${COCO:+--coco_path "$COCO"} --batch_size "$BATCH" \
    --orbax_checkpoint "$ckpt" \
    ${CONFIG_JSON:+--config_json "$CONFIG_JSON"} 2>&1 |
    grep -E "^coco/(AP|AP50|AP75|AR100):" ||
    echo "epoch $ep: eval FAILED (rc=$? — relay hiccup or timeout)"
done
echo SERIES_DONE
