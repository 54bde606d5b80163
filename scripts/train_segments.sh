#!/usr/bin/env bash
# Segmented training: run `cli.train` to a target epoch count as a series
# of short-lived processes, each `--resume`-ing from the previous one.
#
# Why: the remote-device (axon tunnel) client leaks ~25 MB of host RSS per
# training step — measured with /tmp/prof/leak_probe{,2}.py: the leak is
# per host->device argument transfer, unaffected by explicit
# jax.Array.delete(), del+GC, or gc.collect(), and device_get does NOT
# leak. At B=8 (25 MB uint8 canvases/step) that is ~2.9 GB/epoch on the
# 116-step proxy dataset; a 100-epoch run OOMs a 125 GB host around epoch
# 40 (observed: OOM-kill at 124 GB RSS). Nothing repo-side can free
# buffers the tunnel client retains, so long runs recycle the process at
# segment boundaries; the loop writes checkpoint_epoch_{last} on its final
# epoch (force_epoch) and persists best_loss.json, making the stitched run
# epoch-exact vs a single process (same data order: the loader seeds
# per-epoch off the global epoch index).
#
# Usage:
#   TRAIN_ARGS="--synthetic_data ... --work_dir /tmp/prof/run" \
#     EPOCHS=100 SEG=20 scripts/train_segments.sh > run.log 2>&1 &
set -u
cd "${REPO:-$(dirname "$0")/..}" || exit 1
EPOCHS=${EPOCHS:-100}
SEG=${SEG:-20}          # epochs per process: SEG * ~3 GB must fit in RAM
LOG=${LOG:-/tmp/prof/train_segments}
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/wm_jax_cache}"
mkdir -p "$(dirname "$LOG")"

stamp() { date -u +%FT%TZ; }

target=$SEG
seg_i=0
while [ "$target" -le "$EPOCHS" ] || [ "$((target - SEG))" -lt "$EPOCHS" ]; do
  [ "$target" -gt "$EPOCHS" ] && target=$EPOCHS
  echo "[$(stamp)] segment $seg_i: epochs -> $target"
  # shellcheck disable=SC2086
  python -m wildlifemapper_tpu.cli.train $TRAIN_ARGS \
    --epochs "$target" --resume >> "${LOG}.seg${seg_i}.log" 2>&1
  rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "[$(stamp)] segment $seg_i FAILED rc=$rc (log ${LOG}.seg${seg_i}.log)"
    exit "$rc"
  fi
  [ "$target" -ge "$EPOCHS" ] && break
  target=$((target + SEG))
  seg_i=$((seg_i + 1))
done
echo "[$(stamp)] SEGMENTS_COMPLETE epochs=$EPOCHS"
