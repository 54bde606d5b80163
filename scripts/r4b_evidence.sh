#!/usr/bin/env bash
# Round-4 post-reboot evidence leg (r4b): the host rebooted and wiped
# /tmp (checkpoints, synth cache, compile cache). This is the bounded
# re-run of r4_pipeline.sh stages 3-4 only — stages 1-2 (bench, traces,
# sweeps) already landed green on the day leg (PERF.md round-4).
#
# Differences from r4_pipeline.sh stage 3, learned the hard way:
#   - The synth-cache prewarm runs in the BACKGROUND (1-core host,
#     1.5 s/tile): it overlaps the train leg's 10-25 min remote compile
#     instead of serializing in front of it.
#   - The mid-run SIGTERM is ADAPTIVE, not a fixed timeout: with a cold
#     tile cache the first (render-bound) epoch can outlast any fixed
#     bound, and a SIGTERM before the first checkpoint_epoch_* exists
#     voids the resume proof. Stage 1 polls for the first checkpoint,
#     then grants one more epoch, then SIGTERMs.
#
# Usage: nohup scripts/r4b_evidence.sh > /tmp/prof/r4b.log 2>&1 &
#        echo $! > /tmp/prof/r4b.pid
set -u
cd "${REPO:-$(dirname "$0")/..}" || exit 1

PROF=${PROF:-/tmp/prof}
WORK=${WORK:-$PROF/r4b_train}
ANN=${ANN:-$PROF/ann_x4}
EPOCHS=${EPOCHS:-100}
TRAIN_MAX_SECS=${TRAIN_MAX_SECS:-2700}   # hard ceiling on stage 1
EXTRA_EPOCH_SECS=${EXTRA_EPOCH_SECS:-120} # grace after first ckpt appears
RESUME_SECS=${RESUME_SECS:-420}
CONJ_SECS=${CONJ_SECS:-1700}
mkdir -p "$PROF"

# Shared persistent compile cache: resume + conjunction reuse the train
# leg's remote compiles; bench.py defaults to the same dir so the
# driver's end-of-round bench hits it warm.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/wm_jax_cache}"

[ -f "$ANN/train.json" ] || python scripts/build_scaled_ann.py \
    --out "$ANN" --factor 4

stamp() { date -u +%FT%TZ; }

echo "[$(stamp)] STAGE 0: background synth-cache prewarm"
nohup python scripts/prewarm_synth_cache.py --coco_path "$ANN" \
  --splits val,train > "$PROF/prewarm.log" 2>&1 &
echo $! > "$PROF/prewarm.pid"

TRAIN_ARGS=(--synthetic_data --use_amp --train_encoder --clip_max_norm 1.0
            --batch_size 8 --device_normalize --epochs "$EPOCHS"
            --coco_path "$ANN" --aux_loss
            --eval_every 5 --checkpoint_every 1 --use_wandb
            --work_dir "$WORK")

bash scripts/tpu_watch.sh --once || { echo "[$(stamp)] relay down"; exit 1; }

echo "[$(stamp)] STAGE 1: training (adaptive SIGTERM after first ckpt)"
python -m wildlifemapper_tpu.cli.train "${TRAIN_ARGS[@]}" \
  > "$PROF/r4b_train.log" 2>&1 &
TRAIN_PID=$!
echo "$TRAIN_PID" > "$PROF/train.pid"
waited=0
while kill -0 "$TRAIN_PID" 2>/dev/null; do
  if ls -d "$WORK"/checkpoint_epoch_* >/dev/null 2>&1; then
    echo "[$(stamp)] first checkpoint up; granting ${EXTRA_EPOCH_SECS}s"
    sleep "$EXTRA_EPOCH_SECS"
    echo "[$(stamp)] SIGTERM (deliberate mid-run kill for the resume proof)"
    kill -TERM "$TRAIN_PID" 2>/dev/null
    sleep 15; kill -KILL "$TRAIN_PID" 2>/dev/null
    break
  fi
  if [ "$waited" -ge "$TRAIN_MAX_SECS" ]; then
    echo "[$(stamp)] ceiling hit with no checkpoint; killing + aborting"
    kill -KILL "$TRAIN_PID" 2>/dev/null
    exit 1
  fi
  sleep 30; waited=$((waited + 30))
done
wait "$TRAIN_PID" 2>/dev/null
echo "[$(stamp)] stage 1 done"

ls -d "$WORK"/checkpoint_epoch_* >/dev/null 2>&1 || {
  echo "[$(stamp)] NO epoch checkpoint — abort"; exit 1; }

echo "[$(stamp)] STAGE 2: --resume continuation (${RESUME_SECS}s bound)"
timeout -s TERM "$RESUME_SECS" \
  python -m wildlifemapper_tpu.cli.train "${TRAIN_ARGS[@]}" --resume \
  > "$PROF/r4b_resume.log" 2>&1
echo "[$(stamp)] stage 2 rc=$? (124 = hit the bound; partial ckpt ok)"

CKPT="$WORK/best_checkpoint"
[ -d "$CKPT" ] || CKPT=$(ls -d "$WORK"/checkpoint_epoch_* | sort -V | tail -1)
# Stage 3 runs the AP-ratio + throughput legs under the tight bound and
# leaves the drift leg (up to 2 h of cold compiles) to stage 4 with its
# own budget — a 1700 s bound can never cover both (advisor r4).
echo "[$(stamp)] STAGE 3: conjunction on $CKPT (${CONJ_SECS}s bound, --skip_drift)"
timeout -s TERM "$CONJ_SECS" \
  python scripts/conjunction.py --orbax_checkpoint "$CKPT" \
  --coco_path "$ANN" --skip_drift > "$PROF/r4b_conjunction.log" 2>&1
rc3=$?
echo "[$(stamp)] stage 3 rc=$rc3 (verdict: tail -1 $PROF/r4b_conjunction.log)"

DRIFT_SECS=${DRIFT_SECS:-7200}
echo "[$(stamp)] STAGE 4: drift leg (${DRIFT_SECS}s bound)"
timeout -s TERM "$DRIFT_SECS" \
  python scripts/drift_map.py --orbax_checkpoint "$CKPT" --val_tiles \
  --coco_path "$ANN" > "$PROF/r4b_drift.log" 2>&1
echo "[$(stamp)] stage 4 rc=$?"

# Completion marker only when the verdict line actually printed
# (advisor r4: an unconditional marker hides timeouts).
if grep -q '"map_parity_ratio"' "$PROF/r4b_conjunction.log"; then
  echo "[$(stamp)] R4B_COMPLETE"
else
  echo "[$(stamp)] R4B_INCOMPLETE: no verdict line (stage 3 rc=$rc3)"
  exit 1
fi
