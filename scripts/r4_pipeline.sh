#!/usr/bin/env bash
# Round-4 TPU evidence pipeline (VERDICT r3 items 1-3), queued behind the
# axon-relay watchdog. Stages run strictly sequentially — one TPU process
# at a time (CLAUDE.md) — ordered by evidence-value-per-minute so a relay
# that comes back late in the round still lands the top records:
#
#   1. BENCH   bench.py for a green headline record (VERDICT r3 #2;
#              needs no checkpoint, ~20 min incl. cold compile).
#   2. PERF    measure the round-3-queued kernels on hardware:
#              trace_tiers (rank-3 packed GEMMs + Pallas MLP backward are
#              on-path), sweep_train_kernels (tile budgets), softmax knob.
#   3. TRAIN   full-canvas WildlifeMapper on the cached synthetic tiles
#              (--train_encoder / clip-1.0 recipe), with a deliberate
#              mid-run SIGTERM and a --resume continuation — the
#              reference's de-facto integration test (train.py:249-372)
#              plus the checkpoint/resume proof. Resume leg is bounded;
#              a partial best_checkpoint still feeds stage 4.
#   4. CONJ    scripts/conjunction.py on the best checkpoint:
#              trained-weights crop-vs-full drift-as-mAP, both tiers' AP
#              vs GT, crop-tier throughput (BASELINE.json north_star).
#
# Usage: nohup scripts/r4_pipeline.sh > /tmp/prof/r4_pipeline.log 2>&1 &
#        echo $! > /tmp/prof/r4_pipeline.pid
set -u
# REPO override lets the pipeline run from a frozen /tmp copy (editing a
# bash script that a live instance is executing corrupts it mid-read).
cd "${REPO:-$(dirname "$0")/..}"

PROF=${PROF:-/tmp/prof}
WORK=${WORK:-$PROF/r4_train}
EPOCHS=${EPOCHS:-100}
STAGE1_SECS=${STAGE1_SECS:-4200}   # long enough for first compile + >=1 epoch ckpt
mkdir -p "$PROF"

# Persistent XLA executable cache: the resume run and every later stage
# reuse stage 1's (10-25 min) remote compiles instead of repeating them.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PROF/jax_cache}"

# Factor-4 boxes: ~28 px at 768-content (~1.7 patches/animal), the
# convergence-feasible from-scratch benchmark geometry. The bundled
# sub-patch (~7 px) geometry needs SAM-pretrained features the egress
# block withholds; from-scratch on it plateaus at GIoU<=0 (PERF.md r4).
ANN=${ANN:-$PROF/ann_x4}
[ -f "$ANN/train.json" ] || python scripts/build_scaled_ann.py \
    --out "$ANN" --factor 4

# checkpoint_every 1, not 10: the stage-3a SIGTERM lands after the first
# compile + >=1 epoch, and the resume proof needs an epoch checkpoint to
# exist by then — with every=10 the "--resume" leg would silently retrain
# from scratch (train/loop.py: latest_epoch()=None -> start_epoch 0).
TRAIN_ARGS=(--synthetic_data --use_amp --train_encoder --clip_max_norm 1.0
            --batch_size 8 --device_normalize --epochs "$EPOCHS"
            --coco_path "$ANN" --aux_loss
            --eval_every 5 --checkpoint_every 1 --use_wandb
            --work_dir "$WORK")

stamp() { date -u +%FT%TZ; }

STAGE3B_SECS=${STAGE3B_SECS:-7200}  # resume-leg bound: a partial run still
                                    # yields best_checkpoint for stage 4

echo "[$(stamp)] waiting for axon relay..."
bash scripts/tpu_watch.sh || { echo "[$(stamp)] relay never came up"; exit 1; }

echo "[$(stamp)] STAGE 1: headline bench"
python bench.py > "$PROF/r4_bench.json" 2> "$PROF/r4_bench.err"
echo "[$(stamp)] stage 1 rc=$?  $(cat "$PROF/r4_bench.json" 2>/dev/null)"

echo "[$(stamp)] STAGE 2a: per-op traces (parity + crop tiers)"
bash scripts/tpu_watch.sh || exit 1
python scripts/trace_tiers.py parity crop > "$PROF/r4_trace_tiers.log" 2>&1
echo "[$(stamp)] stage 2a rc=$?"

echo "[$(stamp)] STAGE 2b: train-kernel sweep"
bash scripts/tpu_watch.sh || exit 1
python scripts/sweep_train_kernels.py > "$PROF/r4_sweep_train.log" 2>&1
echo "[$(stamp)] stage 2b rc=$?"

echo "[$(stamp)] STAGE 2c: serving-softmax knob (bf16 exp) measurement"
bash scripts/tpu_watch.sh || exit 1
python scripts/sweep_serving_softmax.py > "$PROF/r4_softmax_knob.log" 2>&1
echo "[$(stamp)] stage 2c rc=$?"

echo "[$(stamp)] STAGE 3a: training (will be SIGTERMed at ${STAGE1_SECS}s)"
bash scripts/tpu_watch.sh || exit 1
timeout -s TERM "$STAGE1_SECS" \
  python -m wildlifemapper_tpu.cli.train "${TRAIN_ARGS[@]}" \
  > "$PROF/r4_train_stage1.log" 2>&1
rc=$?
echo "[$(stamp)] stage 3a rc=$rc (124 = killed mid-run, as intended)"

if [ "$rc" -ne 0 ]; then
  # The resume proof is only a proof if a checkpoint actually exists —
  # otherwise --resume silently restarts from scratch and the log lies.
  if ! ls -d "$WORK"/checkpoint_epoch_* >/dev/null 2>&1; then
    echo "[$(stamp)] NO epoch checkpoint after stage 3a — resume leg would"
    echo "  retrain from scratch; rerun with a larger STAGE1_SECS instead."
    exit 1
  fi
  echo "[$(stamp)] STAGE 3b: --resume from the latest epoch checkpoint"
  bash scripts/tpu_watch.sh || exit 1   # relay may have died mid-train
  timeout -s TERM "$STAGE3B_SECS" \
    python -m wildlifemapper_tpu.cli.train "${TRAIN_ARGS[@]}" --resume \
    > "$PROF/r4_train_resume.log" 2>&1
  rc=$?
  echo "[$(stamp)] stage 3b rc=$rc (124 = hit the bound; partial ckpt ok)"
fi
[ -d "$WORK/best_checkpoint" ] || { echo "no best_checkpoint; aborting"; exit 1; }

echo "[$(stamp)] STAGE 4: conjunction evidence"
bash scripts/tpu_watch.sh || exit 1
python scripts/conjunction.py --orbax_checkpoint "$WORK/best_checkpoint" \
  --coco_path "$ANN" > "$PROF/r4_conjunction.log" 2>&1
echo "[$(stamp)] stage 4 rc=$? (verdict: tail -1 $PROF/r4_conjunction.log)"

echo "[$(stamp)] PIPELINE_COMPLETE"
