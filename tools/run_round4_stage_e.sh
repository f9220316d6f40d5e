#!/bin/bash
# Round-4 stage E: post-measurement pass after stage D frees the TPU lane.
#  1. One-process interleaved step-rate A/B across the ablation modes
#     (tools/ab_ablation_step.py) — the clean "compiling the term out"
#     numbers for the VALIDATION ablation table (the per-run wall-clock
#     rays/s in abl_*.json are compile+tunnel-confounded).
# Same wedge-retry discipline as stages A-D; one serialized TPU lane.
set -u
cd /root/repo
mkdir -p logs/r4_results
LOG=logs/r4_queue.log
echo "=== round-4 stage E armed $(date) ===" >> "$LOG"

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 40); do
    probe && return 0
    echo "--- r4e wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r4e ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage D (up to 14 h).
for i in $(seq 1 168); do
  [ -f logs/r4_results/stage_d_done.marker ] && break
  sleep 300
done
[ -f logs/r4_results/stage_d_done.marker ] || abort "stage D never finished"

if [ ! -f logs/r4_results/ab_ablation_step.done ]; then
  wait_tunnel || abort "wedged before ab_ablation_step"
  echo "=== unit ab_ablation_step $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_ablation_step.py \
    > logs/r4_ab_ablation_step.log 2>&1 \
    && touch logs/r4_results/ab_ablation_step.done
fi

echo "=== round-4 stage E finished $(date) ===" >> "$LOG"
touch logs/r4_results/stage_e_done.marker
