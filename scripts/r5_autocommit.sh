#!/usr/bin/env bash
# Insurance for the round-5 conjunction verdict: the moment
# scripts/r5_verdict.sh finishes (R5_VERDICT_DONE in its log), copy the
# one-line JSON verdict out of gitignored _runs/ into the repo and
# commit it, so a session ending or a host reboot cannot lose the
# round's single most important number a fourth time.
#
# Launch detached:  nohup bash scripts/r5_autocommit.sh \
#                     > /root/repo/_runs/autocommit.log 2>&1 &
set -u
cd /root/repo || exit 1
VLOG=${VLOG:-/root/repo/_runs/r5_verdict.log}
RUN=${RUN:-/root/repo/_runs/r5x16}

stamp() { date -u +%FT%TZ; }

echo "[$(stamp)] waiting for R5_VERDICT_DONE in $VLOG"
for i in $(seq 1 1440); do   # up to 12 h
  grep -q "R5_VERDICT_DONE" "$VLOG" 2>/dev/null && break
  sleep 30
done
grep -q "R5_VERDICT_DONE" "$VLOG" || { echo "[$(stamp)] timeout"; exit 1; }

if [ ! -s "$RUN/verdict.json" ]; then
  echo "[$(stamp)] verdict.json missing/empty — committing the logs instead"
  { echo "# r5 verdict leg FAILED $(stamp) — runner log tail:";
    tail -40 "$VLOG"; } > VERDICT_R5_RUN.txt
  git add VERDICT_R5_RUN.txt
  git commit -m "r5 conjunction verdict leg failed: runner log preserved" || true
  exit 1
fi

cp "$RUN/verdict.json" VERDICT_R5_RUN.json
{ echo "# runner log ($(stamp)):"; tail -20 "$VLOG"; } > VERDICT_R5_RUN.log.txt
# Write the documents of record (PERF.md / BASELINE.md / README footnote)
# from the verdict JSON; non-fatal — the raw JSON commit below is the
# irreducible record either way.
python scripts/r5_record.py || echo "[$(stamp)] r5_record.py failed (raw JSON still committed)"
git add VERDICT_R5_RUN.json VERDICT_R5_RUN.log.txt PERF.md BASELINE.md README.md
git commit -m "r5 conjunction verdict of record (auto-committed on completion)" || true
echo "[$(stamp)] committed:"
cat VERDICT_R5_RUN.json
