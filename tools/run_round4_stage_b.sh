#!/bin/bash
# Round-4 stage B: waits for stage A (run_round4_queue.sh) to finish, then
# runs the presample A/B (both verticals, K=5) and an EndoNeRF serving
# sweep at more chunk sizes. One serialized TPU lane throughout.
set -u
cd /root/repo
mkdir -p logs/r4_results
LOG=logs/r4_queue.log
echo "=== round-4 stage B armed $(date) ===" >> "$LOG"

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
    echo "--- r4b wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}
abort() { echo "=== r4b ABORT: $1 $(date) ===" >> "$LOG"; exit 1; }

# Gate on stage A (up to 8 h) — one-TPU-lane rule.
for i in $(seq 1 96); do
  [ -f logs/r4_results/queue_a_done.marker ] && break
  sleep 300
done
[ -f logs/r4_results/queue_a_done.marker ] || abort "stage A never finished"

if [ ! -f logs/r4_results/ab_presample.done ]; then
  wait_tunnel || abort "wedged before ab_presample"
  echo "=== unit ab_presample $(date) ===" >> "$LOG"
  timeout 7200 python tools/ab_presample.py --steps-per-call 5 \
    > logs/r4_ab_presample.log 2>&1 \
    && touch logs/r4_results/ab_presample.done
fi

if [ ! -f logs/r4_results/endonerf_serving_sweep.done ]; then
  wait_tunnel || abort "wedged before serving sweep"
  echo "=== unit endonerf_serving_sweep $(date) ===" >> "$LOG"
  timeout 5400 python tools/bench_eval.py --model endonerf \
    --render-kernel auto --chunks 2048 4096 8192 --chunks-per-call 1 \
    --frames 2 > logs/r4_endonerf_serving_sweep.log 2>&1 \
    && touch logs/r4_results/endonerf_serving_sweep.done
fi

echo "=== round-4 stage B finished $(date) ===" >> "$LOG"
touch logs/r4_results/stage_b_done.marker
