#!/bin/bash
# Round-5 session-2 combined stage: wait for the tunnel probe, then run BOTH
# residual attributions (EndoNeRF parts + EndoSurf glue) in ONE python
# process — the tunnel blocks 10-45 min after every process exit (CLAUDE.md
# round-2 data), so fewer processes = fewer wedge boundaries.
set -u
cd /root/repo
LOG=logs/r5s2_stage_ab.log
echo "=== stage AB start $(date -u) ===" >> "$LOG"

if [ -f /tmp/probe.pid ]; then
  while kill -0 "$(cat /tmp/probe.pid)" 2>/dev/null; do sleep 20; done
fi
if ! grep -q "TPU probe ok" logs/r5s2_probe.log; then
  echo "probe failed; aborting $(date -u)" >> "$LOG"
  exit 1
fi
echo "probe ok $(date -u); waiting out the post-exit wedge inside the" \
     "combined run's own first dispatch" >> "$LOG"

python3 - > logs/r5s2_ab_combined.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import ab_endonerf_parts, ab_endosurf_glue
print("### ab_endonerf_parts", flush=True)
ab_endonerf_parts.main()
print("### ab_endosurf_glue", flush=True)
ab_endosurf_glue.main()
EOF
rc=$?
echo "combined A/B rc=$rc $(date -u)" >> "$LOG"
awk '/^### ab_endonerf_parts/{f="endonerf"} /^### ab_endosurf_glue/{f="endosurf"} /^\{/{print > ("results/r5/ab_" f "_residual.jsonl")}' logs/r5s2_ab_combined.log
touch /tmp/r5s2_stage_ab.done
echo "=== stage AB finished $(date -u) ===" >> "$LOG"
