#!/bin/bash
# Round-5 session-2 stage A: wait for the tunnel probe to come back, then
# run the EndoNeRF step parts attribution (tools/ab_endonerf_parts.py) on
# the real TPU. Follower pattern from tools/run_round3_recover3.sh.
set -u
cd /root/repo
LOG=logs/r5s2_stage_a.log
echo "=== stage A start $(date -u) ===" >> "$LOG"

# Wait for the probe process (pidfile /tmp/probe.pid) to exit.
if [ -f /tmp/probe.pid ]; then
  while kill -0 "$(cat /tmp/probe.pid)" 2>/dev/null; do sleep 20; done
fi
if ! grep -q "TPU probe ok" logs/r5s2_probe.log; then
  echo "probe did not succeed; relaunching probe $(date -u)" >> "$LOG"
  python3 -c "
import time, jax, jax.numpy as jnp, numpy as np
t0=time.time()
x = jnp.ones((8,8))
print('TPU probe ok', float(np.asarray(x @ x)[0,0]), f'{time.time()-t0:.1f}s',
      flush=True)
" >> logs/r5s2_probe.log 2>&1 || { echo "probe2 failed" >> "$LOG"; exit 1; }
fi
echo "probe ok; launching ab_endonerf_parts $(date -u)" >> "$LOG"

python3 tools/ab_endonerf_parts.py > logs/r5s2_ab_endonerf_parts.log 2>&1
rc=$?
echo "ab_endonerf_parts rc=$rc $(date -u)" >> "$LOG"
grep -h "^{" logs/r5s2_ab_endonerf_parts.log > results/r5/ab_endonerf_parts.jsonl 2>/dev/null
touch /tmp/r5s2_stage_a.done
echo "=== stage A finished $(date -u) ===" >> "$LOG"
