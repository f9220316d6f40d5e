#!/bin/bash
# Incremental harvester: snapshot the combined A/B's JSON lines into
# results/r5/ every 60s so a session/environment reset cannot lose them.
cd /root/repo
while true; do
  if [ -f logs/r5s2_ab_combined.log ]; then
    awk '/^### ab_endonerf_parts/{f="endonerf"} /^### ab_endosurf_glue/{f="endosurf"} /^\{/{print > ("results/r5/ab_" f "_residual.jsonl")}' logs/r5s2_ab_combined.log
  fi
  [ -f /tmp/r5s2_stage_ab.done ] && break
  sleep 60
done
