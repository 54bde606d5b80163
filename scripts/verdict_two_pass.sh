#!/usr/bin/env bash
# Round-5 relaunch verdict runner (two-pass): wait for the segmented x16
# training run, then run conjunction.py twice —
#   pass A: --skip_drift --skip_throughput  -> fast partial (the two
#           AP-vs-GT legs = the mAP parity ratio of record), committed
#           immediately as VERDICT_R5_PARTIAL.json;
#   pass B: full conjunction (drift + throughput) -> verdict.json, which
#           scripts/r5_autocommit.sh turns into the documents of record.
# Evidence ratchets: if the session/host dies mid-pass-B, pass A's ratio
# is already in git.
set -u
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/repo/_runs/jax_cache
export WM_SYNTH_CACHE=/root/repo/_runs/synth_cache
RUN=/root/repo/_runs/r5x16
TRAIN_LOG=/root/repo/_runs/r5x16.log
COCO=/root/repo/_runs/ann_x16full

stamp() { date -u +%FT%TZ; }

echo "[$(stamp)] waiting for SEGMENTS_COMPLETE in $TRAIN_LOG"
for i in $(seq 1 720); do   # up to 6 h
  grep -q "SEGMENTS_COMPLETE" "$TRAIN_LOG" 2>/dev/null && break
  grep -q "FAILED" "$TRAIN_LOG" 2>/dev/null && { echo "[$(stamp)] training FAILED — no verdict"; exit 1; }
  sleep 30
done
grep -q "SEGMENTS_COMPLETE" "$TRAIN_LOG" || { echo "[$(stamp)] timeout waiting for training"; exit 1; }

CKPT=$RUN/best_checkpoint
[ -d "$CKPT" ] || CKPT=$(ls -d "$RUN"/checkpoint_epoch_* 2>/dev/null | sort -V | tail -1)
[ -n "$CKPT" ] || { echo "[$(stamp)] no checkpoint found"; exit 1; }
echo "[$(stamp)] training complete; checkpoint $CKPT; probing relay"

timeout 280 python -c "import jax; jax.devices()" || {
  echo "[$(stamp)] relay probe failed; retrying every 10 min up to 2 h"
  ok=""
  for i in $(seq 1 12); do
    sleep 600
    timeout 280 python -c "import jax; jax.devices()" && { ok=1; break; }
  done
  [ -n "$ok" ] || { echo "[$(stamp)] relay never recovered"; exit 1; }
}

echo "[$(stamp)] PASS A: conjunction --skip_drift --skip_throughput"
timeout 5400 python scripts/conjunction.py \
  --orbax_checkpoint "$CKPT" --coco_path "$COCO" \
  --skip_drift --skip_throughput 2> "$RUN/conjA.stderr" | tee "$RUN/conjA.out"
grep '^{' "$RUN/conjA.out" | tail -1 > "$RUN/verdict_partial.json"
if [ -s "$RUN/verdict_partial.json" ]; then
  cp "$RUN/verdict_partial.json" VERDICT_R5_PARTIAL.json
  git add VERDICT_R5_PARTIAL.json
  git commit -m "r5 verdict pass A (AP-vs-GT legs only, marked partial): crop/full mAP parity on the relaunched x16 checkpoint" || true
  echo "[$(stamp)] pass A committed:"
  cat "$RUN/verdict_partial.json"
else
  echo "[$(stamp)] pass A produced no verdict line (stderr tail):"
  tail -20 "$RUN/conjA.stderr"
fi

echo "[$(stamp)] PASS B: full conjunction"
timeout 10800 python scripts/conjunction.py \
  --orbax_checkpoint "$CKPT" \
  --coco_path "$COCO" 2> "$RUN/conjunction.stderr" | tee "$RUN/conjunction.out"
rc=$?
grep '^{' "$RUN/conjunction.out" | tail -1 > "$RUN/verdict.json"
echo "[$(stamp)] conjunction rc=$rc verdict:"
cat "$RUN/verdict.json"
echo "[$(stamp)] R5_VERDICT_DONE"
