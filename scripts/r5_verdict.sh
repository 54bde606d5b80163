#!/usr/bin/env bash
# Round-5 conjunction verdict runner: waits for the segmented x16
# training run to finish, then runs scripts/conjunction.py on the best
# checkpoint and records the one-line JSON verdict in the run directory
# (inside /root so a /tmp-wiping reboot cannot eat it).
#
# Launch detached:  nohup bash scripts/r5_verdict.sh > /tmp/prof/r5_verdict.log 2>&1 &
set -u
cd /root/repo || exit 1
# Everything persistent under /root/repo/_runs — a /tmp-wiping host reboot
# (observed twice this round) must not eat the run, the caches, or the verdict.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/repo/_runs/jax_cache}"
export WM_SYNTH_CACHE="${WM_SYNTH_CACHE:-/root/repo/_runs/synth_cache}"
RUN=${RUN:-/root/repo/_runs/r5x16}
TRAIN_LOG=${TRAIN_LOG:-/root/repo/_runs/r5x16.log}
COCO=${COCO:-/root/repo/_runs/ann_x16full}

stamp() { date -u +%FT%TZ; }

echo "[$(stamp)] waiting for SEGMENTS_COMPLETE in $TRAIN_LOG"
for i in $(seq 1 1000); do   # up to ~8.3 h
  if grep -q "SEGMENTS_COMPLETE" "$TRAIN_LOG" 2>/dev/null; then break; fi
  if grep -q "FAILED" "$TRAIN_LOG" 2>/dev/null; then
    echo "[$(stamp)] training FAILED — not running the verdict"; exit 1
  fi
  sleep 30
done
grep -q "SEGMENTS_COMPLETE" "$TRAIN_LOG" || { echo "[$(stamp)] timeout waiting for training"; exit 1; }
echo "[$(stamp)] training complete; probing relay"

timeout 280 python -c "import jax; jax.devices()" || {
  echo "[$(stamp)] relay probe failed; retrying every 10 min up to 2 h"
  ok=""
  for i in $(seq 1 12); do
    sleep 600
    timeout 280 python -c "import jax; jax.devices()" && { ok=1; break; }
  done
  [ -n "$ok" ] || { echo "[$(stamp)] relay never recovered"; exit 1; }
}

echo "[$(stamp)] running conjunction.py"
timeout 10800 python scripts/conjunction.py \
  --orbax_checkpoint "$RUN/best_checkpoint" \
  --coco_path "$COCO" 2> "$RUN/conjunction.stderr" | tee "$RUN/conjunction.out"
rc=$?
# the verdict is the last line starting with '{'
grep '^{' "$RUN/conjunction.out" | tail -1 > "$RUN/verdict.json"
echo "[$(stamp)] conjunction rc=$rc verdict:"
cat "$RUN/verdict.json"
echo "[$(stamp)] R5_VERDICT_DONE"
