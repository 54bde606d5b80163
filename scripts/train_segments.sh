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

# Stall watchdog: the axon tunnel connection can die mid-run (observed
# 08-20 00:45 UTC at epoch 52: the client loses its TCP connection to the
# relay and blocks forever in a futex wait — zero CPU, no log output —
# while the relay itself stays healthy for NEW clients). A hung dispatch
# never returns, so detect it by segment-log silence: a training epoch
# prints at least every ~75 s, and eval/checkpoint epochs within a few
# minutes. WATCHDOG_SECS of log silence => SIGKILL the exact child PID
# and retry the segment (resume makes a mid-epoch kill epoch-safe: the
# loop restarts from the last checkpoint_epoch_* with identical per-epoch
# data order).
WATCHDOG_SECS=${WATCHDOG_SECS:-900}
# Startup is legitimately silent for a long stretch: checkpoint restore +
# cached-compile load + first-step dispatch took ~13 min of no log output
# on a healthy run (observed 01:02->01:15 UTC) — longer than WATCHDOG_SECS.
# Until THIS attempt prints its first "Epoch: [" line, the more lenient
# startup grace applies.
STARTUP_GRACE_SECS=${STARTUP_GRACE_SECS:-2400}
POLL_SECS=${POLL_SECS:-30}      # watchdog poll cadence (tests shrink it)
RETRIES=${RETRIES:-2}   # extra attempts per segment after the first
PROBE_SLEEP=${PROBE_SLEEP:-300} # wait between relay probes before a retry

run_segment() {  # $1=target $2=log ; returns child rc, or 99 on stall-kill
  local off=0
  [ -f "$2" ] && off=$(stat -c %s "$2")
  # shellcheck disable=SC2086
  python -m wildlifemapper_tpu.cli.train $TRAIN_ARGS \
    --epochs "$1" --resume >> "$2" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep "$POLL_SECS"
    local limit=$WATCHDOG_SECS
    # Only bytes THIS attempt appended count toward leaving startup —
    # a previous attempt's epoch lines in the shared log must not
    # shorten a fresh restore's grace window.
    if ! tail -c "+$((off + 1))" "$2" 2>/dev/null | grep -q "Epoch: \["; then
      limit=$STARTUP_GRACE_SECS
    fi
    local age=$(( $(date +%s) - $(stat -c %Y "$2" 2>/dev/null || date +%s) ))
    if [ "$age" -gt "$limit" ]; then
      echo "[$(stamp)] watchdog: no log output for ${age}s (limit ${limit}s) — killing pid $pid"
      kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 99
    fi
  done
  wait "$pid"
}

target=$SEG
seg_i=0
while [ "$target" -le "$EPOCHS" ] || [ "$((target - SEG))" -lt "$EPOCHS" ]; do
  [ "$target" -gt "$EPOCHS" ] && target=$EPOCHS
  attempt=0
  rc=1
  while [ "$attempt" -le "$RETRIES" ]; do
    echo "[$(stamp)] segment $seg_i: epochs -> $target (attempt $attempt)"
    run_segment "$target" "${LOG}.seg${seg_i}.log"
    rc=$?
    [ "$rc" -eq 0 ] && break
    echo "[$(stamp)] segment $seg_i attempt $attempt exited rc=$rc; probing relay before retry"
    # Bounded probe: if the relay is down, wait for it (up to ~30 min)
    # rather than burning retries into a dead tunnel.
    for probe_i in 1 2 3; do
      timeout 280 python -c "import jax; jax.devices()" >/dev/null 2>&1 && break
      echo "[$(stamp)] relay probe $probe_i failed; sleeping ${PROBE_SLEEP}s"
      sleep "$PROBE_SLEEP"
    done
    attempt=$((attempt + 1))
  done
  if [ "$rc" -ne 0 ]; then
    echo "[$(stamp)] segment $seg_i FAILED rc=$rc after $attempt retries (log ${LOG}.seg${seg_i}.log)"
    exit "$rc"
  fi
  [ "$target" -ge "$EPOCHS" ] && break
  target=$((target + SEG))
  seg_i=$((seg_i + 1))
done
echo "[$(stamp)] SEGMENTS_COMPLETE epochs=$EPOCHS"
