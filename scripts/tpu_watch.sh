#!/usr/bin/env bash
# Bounded axon-relay watchdog (CLAUDE.md "TPU environment gotchas").
#
# The axon relay (127.0.0.1:8113) is the container's only path to the TPU
# chip and can die without anything in-VM able to restart it. Worse,
# jax.devices() can HANG (not error) against a dead relay, so any naive
# "try jax first" script wedges forever. This watchdog:
#   1. fast-fails when the relay port isn't even listening;
#   2. otherwise runs a bounded jax.devices() probe (timeout kills a hang);
#   3. loops until the relay answers or --max-wait expires.
#
# Usage:
#   scripts/tpu_watch.sh                  # wait (default 10h), rc 0 when up
#   scripts/tpu_watch.sh --once           # single probe: rc 0 up / rc 1 down
#   scripts/tpu_watch.sh -- CMD ARGS...   # wait, then exec CMD (the queue)
#
# Poll interval 120 s; each probe bounded at $PROBE_TIMEOUT (default 90 s).
set -u

# 280 s matches CLAUDE.md's prescribed bounded probe (and bench.py): jax
# backend init over a cold/slow tunnel can legitimately take minutes — a
# shorter timeout misclassifies a healthy relay as down.
PROBE_TIMEOUT="${PROBE_TIMEOUT:-280}"
MAX_WAIT="${MAX_WAIT:-36000}"
RELAY_HOST="${RELAY_HOST:-127.0.0.1}"
RELAY_PORT="${RELAY_PORT:-8113}"
# Each failed probe costs a full jax import (~30 s of the host's single
# core). For long overnight waits alongside CPU training, raise POLL_SECS
# so the watchdog doesn't tax the training loop.
POLL_SECS="${POLL_SECS:-120}"

once=0
while [ $# -gt 0 ]; do
  case "$1" in
    --once) once=1; shift ;;
    --max-wait) MAX_WAIT="$2"; shift 2 ;;
    --) shift; break ;;
    *) echo "tpu_watch: unknown arg $1" >&2; exit 2 ;;
  esac
done

probe() {
  # Port check first: connect() to a closed port fails in ms, while the
  # jax probe against a half-dead relay can burn its full timeout.
  if ! timeout 5 bash -c "echo > /dev/tcp/$RELAY_HOST/$RELAY_PORT" 2>/dev/null; then
    return 1
  fi
  timeout "$PROBE_TIMEOUT" python -c \
    "import jax; ds = jax.devices(); assert ds, 'no devices'" 2>/dev/null
}

start=$(date +%s)
while true; do
  if probe; then
    echo "tpu_watch: relay up at $(date -u +%FT%TZ)"
    [ $# -gt 0 ] && exec "$@"
    exit 0
  fi
  if [ "$once" = 1 ]; then
    echo "tpu_watch: relay down at $(date -u +%FT%TZ)"
    exit 1
  fi
  now=$(date +%s)
  if [ $((now - start)) -ge "$MAX_WAIT" ]; then
    echo "tpu_watch: relay still down after ${MAX_WAIT}s; giving up"
    exit 1
  fi
  sleep "$POLL_SECS"
done
