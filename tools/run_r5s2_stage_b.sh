#!/bin/bash
# Round-5 session-2 stage B: after stage A (EndoNeRF parts attribution)
# completes, run the EndoSurf glue attribution on the real TPU.
set -u
cd /root/repo
LOG=logs/r5s2_stage_b.log
echo "=== stage B start $(date -u) ===" >> "$LOG"

while [ ! -f /tmp/r5s2_stage_a.done ]; do sleep 30; done
echo "stage A done; launching ab_endosurf_glue $(date -u)" >> "$LOG"

python3 tools/ab_endosurf_glue.py > logs/r5s2_ab_endosurf_glue.log 2>&1
rc=$?
echo "ab_endosurf_glue rc=$rc $(date -u)" >> "$LOG"
grep -h "^{" logs/r5s2_ab_endosurf_glue.log > results/r5/ab_endosurf_glue.jsonl 2>/dev/null
touch /tmp/r5s2_stage_b.done
echo "=== stage B finished $(date -u) ===" >> "$LOG"
