#!/bin/bash
# Round-3 TPU queue, part 2 (runs after run_round3_queue.sh):
#   5. step attribution at the shipping config with the megakernel on
#   6. offline-inference (serving path) throughput with the mega fwd kernels
set -u
cd /root/repo
LOG=logs/round3_queue2.log

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
assert float(np.asarray(x @ x)[0, 0]) == 8.0
" >/dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 40); do
    probe && return 0
    echo "--- wedged $(date); sleep 300 ---" >> "$LOG"
    sleep 300
  done
  return 1
}

echo "=== queue2 start $(date) ===" >> "$LOG"
if [ ! -f logs/profile_mk_done.marker ]; then
  wait_tunnel
  echo "=== profile_step shipping+mega $(date) ===" >> "$LOG"
  timeout 5400 python tools/profile_step.py --precision default \
    --activation-dtype bfloat16 --jac-mode linearize --megakernel on \
    >> "$LOG" 2>&1 && touch logs/profile_mk_done.marker
fi
if [ ! -f logs/bench_eval_done.marker ]; then
  wait_tunnel
  echo "=== bench_eval sweep (cpc x megakernel) $(date) ===" >> "$LOG"
  timeout 5400 python tools/bench_eval.py --chunks 2048 4096 \
    --chunks-per-call 1 8 32 --megakernel auto >> "$LOG" 2>&1 \
    && timeout 5400 python tools/bench_eval.py --chunks 2048 4096 \
    --chunks-per-call 1 8 --megakernel off >> "$LOG" 2>&1 \
    && touch logs/bench_eval_done.marker
fi
echo "=== queue2 done $(date) ===" >> "$LOG"
touch logs/round3_queue2_done.marker
